package graft.config

import org.apache.spark.sql.SparkSession

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** `$name` / `${name}` variable substitution over a [[CVal]] tree.
  *
  * Semantics mirror the reference's VarSubstitution.scala:
  *   - variable names are `[A-Za-z][A-Za-z0-9_]*` (:148-150);
  *   - first write wins — a duplicate definition is an error (:32-36);
  *   - values may not themselves contain variable references (:28-30),
  *     so resolution never recurses;
  *   - a string that is EXACTLY one variable reference takes the
  *     variable's typed value; otherwise each reference interpolates its
  *     string form (:79-124);
  *   - referencing an undefined variable is an error (:96-103).
  */
final class VarSub(envGet: String => String = System.getenv) {
  import VarSub._

  private val dict = mutable.LinkedHashMap[String, CVal]()
  private val errs = mutable.ArrayBuffer[String]()

  def errors: Seq[String] = errs.toSeq
  def entries: Seq[(String, CVal)] = dict.toSeq

  def add(name: String, value: CVal): Unit =
    if (!NameRegex.matches(name))
      errs += s"bad variable name '$name' (must match $NameRegexStr)"
    else if (hasVarRef(value))
      errs += s"variable '$name' value may not reference other variables: ${value.render}"
    else if (dict.contains(name))
      errs += s"variable '$name' already defined (first write wins)"
    else dict(name) = value

  /** CLI-provided k=v pairs — added before config vars so they take
    * precedence under first-write-wins (Main.scala:26). */
  def addStrings(vars: Map[String, String]): Unit =
    vars.foreach { case (k, v) => add(k, CVal.CStr(v)) }

  /** Resolve one config-var spec into the dict; `env`/`shell`/`sql`
    * sources themselves undergo substitution first (ConfigVar.scala:27,
    * :49, :81 — so e.g. `sql: SELECT max(x) FROM $table` works). */
  def resolve(spark: SparkSession, v: VarSpec): Unit = v match {
    case VarValue(name, value) => add(name, substitute(value))
    case VarEnv(name, env) =>
      substituteString(env) match {
        case Left(e) => errs += e
        case Right(e) => readEnv(e, envGet) match {
          case EnvPresent(value) => add(name, CVal.CStr(value))
          case EnvUnset => errs += s"variable '$name': environment variable '$e' not set"
          case EnvInaccessible(m) =>
            errs += s"variable '$name': environment variable '$e' inaccessible (security): $m"
          case EnvError(m) =>
            errs += s"variable '$name': reading environment variable '$e' failed: $m"
        }
      }
    case VarShell(name, shell) =>
      substituteString(shell) match {
        case Left(e) => errs += e
        case Right(cmd) =>
          Try {
            val out = new StringBuilder
            val code = scala.sys.process.Process(Seq("/bin/sh", "-c", cmd))
              .!(scala.sys.process.ProcessLogger(line => out.append(line).append('\n'), _ => ()))
            (code, out.toString)
          } match {
            case Success((0, out)) if out.nonEmpty =>
              add(name, CVal.CStr(out.split("\n").head))
            case Success((0, _)) => errs += s"variable '$name': shell '$cmd' produced no output"
            case Success((code, _)) => errs += s"variable '$name': shell '$cmd' exited $code"
            case Failure(t) => errs += s"variable '$name': shell '$cmd' failed: ${t.getMessage}"
          }
      }
    case VarSql(name, sql) =>
      substituteString(sql) match {
        case Left(e) => errs += e
        case Right(q) =>
          Try(spark.sql(q).head(1)) match {
            case Success(rows) if rows.isEmpty => errs += s"variable '$name': sql '$q' returned 0 rows"
            case Success(rows) => add(name, CVal.fromJava(rows.head.get(0)))
            case Failure(t) => errs += s"variable '$name': sql '$q' failed: ${t.getMessage}"
          }
      }
  }

  /** Substitute every string in a tree; records missing-variable errors. */
  def substitute(v: CVal): CVal = v match {
    case CVal.CStr(s) => substituteStr(s)
    case CVal.CArr(vs) => CVal.CArr(vs.map(substitute))
    case CVal.CObj(fs) => CVal.CObj(fs.map { case (k, x) => (k, substitute(x)) })
    case other => other
  }

  private def substituteStr(s: String): CVal = {
    WholeVarRegex.findFirstMatchIn(s) match {
      case Some(m) =>
        val name = Option(m.group(1)).getOrElse(m.group(2))
        dict.get(name) match {
          case Some(value) => value // whole-string reference: typed replacement
          case None => errs += s"undefined variable '$name' in '$s'"; CVal.CStr(s)
        }
      case None =>
        CVal.CStr(VarRefRegex.replaceAllIn(s, m => {
          val name = Option(m.group(1)).getOrElse(m.group(2))
          scala.util.matching.Regex.quoteReplacement(dict.get(name) match {
            case Some(value) => value.asInterpolation
            case None => errs += s"undefined variable '$name' in '$s'"; m.matched
          })
        }))
    }
  }

  private def substituteString(s: String): Either[String, String] = {
    val before = errs.size
    val out = substituteStr(s).asInterpolation
    if (errs.size > before) {
      // claim ALL errors this substitution added (a string can reference
      // several undefined variables) so none linger in the shared buffer
      // for the caller to double-report
      val added = errs.slice(before, errs.size).mkString("; ")
      errs.remove(before, errs.size - before)
      Left(added)
    } else Right(out)
  }

  private def hasVarRef(v: CVal): Boolean = v match {
    case CVal.CStr(s) => VarRefRegex.findFirstIn(s).isDefined
    case CVal.CArr(vs) => vs.exists(hasVarRef)
    case CVal.CObj(fs) => fs.exists(f => hasVarRef(f._2))
    case _ => false
  }
}

object VarSub {

  /** Environment-variable read taxonomy (reference
    * EnvironmentVariables.scala:6-56): a variable can be Present, Unset,
    * Inaccessible (a security manager denies the read), or Error (any
    * other failure) — the last two are distinct failure modes, not
    * "unset", and their diagnostics must say so. */
  sealed trait EnvResult
  final case class EnvPresent(value: String) extends EnvResult
  case object EnvUnset extends EnvResult
  final case class EnvInaccessible(msg: String) extends EnvResult
  final case class EnvError(msg: String) extends EnvResult

  /** `get` is injectable so the four-state matrix is testable without a
    * real security manager. */
  def readEnv(name: String, get: String => String = System.getenv): EnvResult =
    try Option(get(name)).fold[EnvResult](EnvUnset)(EnvPresent.apply)
    catch {
      case e: SecurityException => EnvInaccessible(Option(e.getMessage).getOrElse("denied"))
      case scala.util.control.NonFatal(t) =>
        EnvError(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
    }

  private val NameRegexStr = "[A-Za-z][A-Za-z0-9_]*"
  private val NameRegex = NameRegexStr.r
  /** `$name` or `${name}` (VarSubstitution.scala:148-150). */
  private[config] val VarRefRegex = ("\\$(" + NameRegexStr + ")|\\$\\{(" + NameRegexStr + ")\\}").r
  private val WholeVarRegex = ("^(?:\\$(" + NameRegexStr + ")|\\$\\{(" + NameRegexStr + ")\\})$").r
}

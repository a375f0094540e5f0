package graft.config

import graft.model.{CheckSpec, TableSpec}
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal immutable value tree for parsed config (YAML or JSON): the
  * layer on which variable substitution operates before typed decoding.
  * Mirrors the role circe's `Json` plays in the reference
  * (ConfigParser.scala:28-31, VarSubstitution.scala:10-13) without the
  * circe dependency — the offline resolver only ships Spark's jars, so
  * YAML arrives via snakeyaml (bundled with Spark) as Java collections
  * and is converted here once.
  */
sealed trait CVal {
  def render: String = this match {
    case CVal.CNull => "null"
    case CVal.CBool(b) => b.toString
    case CVal.CLong(n) => n.toString
    case CVal.CDbl(d) => if (d.isNaN || d.isInfinite) "\"" + d + "\"" else d.toString
    case CVal.CStr(s) => graft.report.JsonReport.esc(s)
    case CVal.CArr(vs) => vs.map(_.render).mkString("[", ",", "]")
    case CVal.CObj(fs) => fs.map { case (k, v) =>
      s"${graft.report.JsonReport.esc(k)}:${v.render}" }.mkString("{", ",", "}")
  }

  /** String form used when a variable is interpolated into a larger
    * string (VarSubstitution.scala:108-114: strings raw, others as JSON). */
  def asInterpolation: String = this match {
    case CVal.CStr(s) => s
    case other => other.render
  }
}

object CVal {
  case object CNull extends CVal
  final case class CBool(v: Boolean) extends CVal
  final case class CLong(v: Long) extends CVal
  final case class CDbl(v: Double) extends CVal
  final case class CStr(v: String) extends CVal
  final case class CArr(vs: Vector[CVal]) extends CVal
  final case class CObj(fields: Vector[(String, CVal)]) extends CVal {
    def get(key: String): Option[CVal] = fields.collectFirst { case (`key`, v) => v }
    def has(key: String): Boolean = fields.exists(_._1 == key)
  }

  /** snakeyaml (and Jackson) emit java.util collections + boxed scalars. */
  def fromJava(o: Any): CVal = o match {
    case null => CNull
    case s: String => CStr(s)
    case b: java.lang.Boolean => CBool(b)
    case i: java.lang.Integer => CLong(i.longValue)
    case l: java.lang.Long => CLong(l.longValue)
    case s: java.lang.Short => CLong(s.longValue)
    case b: java.lang.Byte => CLong(b.longValue)
    case f: java.lang.Float => CDbl(f.doubleValue)
    case d: java.lang.Double => CDbl(d.doubleValue)
    case bi: java.math.BigInteger => CLong(bi.longValueExact)
    case bd: java.math.BigDecimal => CDbl(bd.doubleValue)
    case m: java.util.Map[_, _] =>
      val it = m.entrySet().iterator()
      val buf = Vector.newBuilder[(String, CVal)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey.toString -> fromJava(e.getValue)) }
      CObj(buf.result())
    case l: java.util.List[_] =>
      val it = l.iterator()
      val buf = Vector.newBuilder[CVal]
      while (it.hasNext) buf += fromJava(it.next())
      CArr(buf.result())
    case other => CStr(other.toString)
  }
}

/** The four config-variable kinds (ConfigVar.scala:13-105): literal,
  * environment, shell command stdout, first cell of a Spark SQL result. */
sealed trait VarSpec { def name: String }
final case class VarValue(name: String, value: CVal) extends VarSpec
final case class VarEnv(name: String, env: String) extends VarSpec
final case class VarShell(name: String, shell: String) extends VarSpec
final case class VarSql(name: String, sql: String) extends VarSpec

/** Report sinks (ValidatorOutput.scala:14-52): a JSON file (optionally
  * appended) or a program the report is piped into. */
sealed trait OutputSpec
final case class FileOutput(filename: String, append: Boolean) extends OutputSpec
final case class PipeOutput(pipe: String, ignoreError: Boolean) extends OutputSpec

/** SMTP parameters are parsed for config parity but mail is not sent from
  * this engine (no SMTP in scope); the config still round-trips to the
  * report (EmailConfig in the reference, ValidatorConfig.scala:16-24). */
final case class EmailConfig(
    smtpHost: String, subject: String, from: String, to: Seq[String])

/** One source kind per reference source (ValidatorTable.scala:228-392). */
sealed trait SourceSpec {
  def describe: String
  def load(spark: SparkSession): DataFrame = this match {
    case HiveSource(db, table) => Sources.hiveTable(spark, s"$db.$table")
    case OrcSource(path) => Sources.orc(spark, path)
    case ParquetSource(path) => Sources.parquet(spark, path)
    case FormatSource(fmt, options, paths) => Sources.format(spark, fmt, options, paths)
  }
}
final case class HiveSource(db: String, table: String) extends SourceSpec {
  def describe = s"$db.$table"
}
final case class OrcSource(orcFile: String) extends SourceSpec {
  def describe = orcFile
}
final case class ParquetSource(parquetFile: String) extends SourceSpec {
  def describe = parquetFile
}
final case class FormatSource(format: String, options: Map[String, String],
    loadData: Seq[String]) extends SourceSpec {
  def describe = s"format:$format"
}

final case class TableConfig(
    source: SourceSpec,
    condition: Option[String],
    keyColumns: Option[Seq[String]],
    checks: Seq[CheckSpec]) {

  def toTableSpec: TableSpec =
    TableSpec(source.describe, source.load, condition, keyColumns, checks)
}

/** Typed whole-run configuration (ValidatorConfig.scala:16-24).
  * `resolvedVars` carries the final substitution dictionary (string form)
  * for the report's varSubDict section (ValidatorConfig.scala:84). */
final case class GraftConfig(
    numKeyCols: Int,
    numErrorsToReport: Int,
    email: Option[EmailConfig],
    detailedErrors: Boolean,
    vars: Seq[VarSpec],
    outputs: Seq[OutputSpec],
    tables: Seq[TableConfig],
    resolvedVars: Seq[(String, String)] = Nil)

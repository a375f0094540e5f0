package graft.report

import graft.config.{FileOutput, OutputSpec, PipeOutput}
import org.apache.spark.sql.SparkSession

import scala.util.{Failure, Success, Try}

/** Report sinks (reference IO.scala:189-287, :296-322,
  * ValidatorOutput.scala:14-52): write the JSON report to a local/HDFS
  * path (optionally appending) or pipe it to a program's stdin. Paths go
  * through the Hadoop FileSystem API, so any filesystem the Spark
  * session can reach (file://, hdfs://, s3a://…) works unchanged. */
object ReportIO {

  /** Pre-flight writability probe (reference Main.scala:55-66,
    * IO.canAppendOrCreate IO.scala:134-139): verify a report path could be
    * created or appended BEFORE any check runs — an hour-long 100 TB run
    * followed by a failed report write is exactly what this prevents.
    * Existing path must be a writable file; otherwise the nearest existing
    * ancestor must be a writable directory. Uses FileSystem.access so it
    * works on any Hadoop filesystem the session can reach. */
  def canAppendOrCreate(spark: SparkSession, path: String): Either[String, Unit] =
    Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) {
        if (fs.getFileStatus(p).isDirectory)
          throw new java.io.IOException("path is a directory")
        fs.access(p, org.apache.hadoop.fs.permission.FsAction.WRITE)
      } else {
        var anc = p.getParent
        while (anc != null && !fs.exists(anc)) anc = anc.getParent
        if (anc == null) throw new java.io.IOException("no existing ancestor directory")
        if (!fs.getFileStatus(anc).isDirectory)
          throw new java.io.IOException(s"ancestor '$anc' is not a directory")
        fs.access(anc, org.apache.hadoop.fs.permission.FsAction.WRITE)
      }
    } match {
      case Success(_) => Right(())
      case Failure(t) => Left(s"report path '$path' is not writable: ${t.getMessage}")
    }

  /** Left(error) on failure. */
  def writeFile(spark: SparkSession, path: String, content: String,
      append: Boolean = false): Either[String, Unit] =
    Try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Append via read-concat-rewrite: FileSystem.append is unsupported
      // on several implementations (local FS included historically); a
      // report is small, so the rewrite is simpler and portable.
      val previous =
        if (append && fs.exists(p)) {
          val in = fs.open(p)
          try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        } else ""
      val out = fs.create(p, true)
      try out.write((previous + content + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } match {
      case Success(_) => Right(())
      case Failure(t) => Left(s"failed to write report to '$path': ${t.getMessage}")
    }

  /** Pipe the report into `program`'s stdin (IO.scala:296-322). */
  def pipe(program: String, content: String,
      ignoreError: Boolean = false): Either[String, Unit] =
    Try {
      val io = new java.io.ByteArrayInputStream(
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (scala.sys.process.Process(Seq("/bin/sh", "-c", program)) #< io).!
    } match {
      case Success(0) => Right(())
      case Success(code) if ignoreError => Right(())
      case Success(code) => Left(s"pipe '$program' exited $code")
      case Failure(t) if ignoreError => Right(())
      case Failure(t) => Left(s"pipe '$program' failed: ${t.getMessage}")
    }

  def emit(spark: SparkSession, out: OutputSpec, content: String): Either[String, Unit] =
    out match {
      case FileOutput(f, append) => writeFile(spark, f, content, append)
      case PipeOutput(p, ignoreError) => pipe(p, content, ignoreError)
    }
}

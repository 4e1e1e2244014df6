package graft.pipeline

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.SparkSession

/** Landing-directory harness ops — the reference's S3 helper surface
  * (S9/S10): upload a raw file, list what landed, clear the prefix
  * (/root/reference/setup/incremental-etl-helper.py:6-19,
  * notebooks/demo-notebook.py:141 `dbutils.fs.ls`). Local filesystem
  * here; the same calls map to any Hadoop-compatible store. */
object Landing {

  /** S9: land a file (atomic move-into-place so a running file stream
    * never observes a partial write — the property object stores give
    * for free and local filesystems need the temp-then-rename for). */
  def land(content: String, landingDir: String, fileName: String): Path = {
    val dir = Files.createDirectories(Paths.get(landingDir))
    val tmp = Files.createTempFile(dir, s".tmp-$fileName", "")
    Files.writeString(tmp, content)
    Files.move(tmp, dir.resolve(fileName), StandardCopyOption.ATOMIC_MOVE)
  }

  /** S9: copy an existing file into the landing dir. */
  def landFile(src: Path, landingDir: String, fileName: String): Path = {
    val dir = Files.createDirectories(Paths.get(landingDir))
    val tmp = Files.createTempFile(dir, s".tmp-$fileName", "")
    Files.copy(src, tmp, StandardCopyOption.REPLACE_EXISTING)
    Files.move(tmp, dir.resolve(fileName), StandardCopyOption.ATOMIC_MOVE)
  }

  /** S10: list landed files (name, size) — `dbutils.fs.ls` analog. */
  def list(landingDir: String): Seq[(String, Long)] = {
    val p = Paths.get(landingDir)
    if (!Files.isDirectory(p)) Seq.empty
    else Using.resource(Files.list(p)) { s =>
      s.iterator.asScala
        .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("."))
        .map(f => (f.getFileName.toString, Files.size(f)))
        .toSeq
    }.sortBy(_._1)
  }

  /** S9: clear the landing prefix (helper :16-19). */
  def clear(landingDir: String): Unit = {
    val p = Paths.get(landingDir)
    if (Files.isDirectory(p))
      Using.resource(Files.list(p)) { s =>
        s.iterator.asScala.filter(Files.isRegularFile(_)).toSeq
      }.foreach(Files.delete)
  }
}

/** D8: SQL parameterization via session conf — the reference sets
  * `spark.conf.set('db.x', ...)` and writes `${db.x}` inside SQL text
  * (demo-notebook.py:85-89). `sql` interpolates `${key}` placeholders
  * from the session conf and runs the result. */
object ConfSql {
  private val Placeholder = raw"\$$\{([^}]+)\}".r

  def interpolate(spark: SparkSession, text: String): String =
    Placeholder.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(spark.conf.get(m.group(1))))

  def sql(spark: SparkSession, text: String): org.apache.spark.sql.DataFrame =
    spark.sql(interpolate(spark, text))
}

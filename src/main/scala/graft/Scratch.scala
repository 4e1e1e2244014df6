package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

import scala.util.Try

/** Scratch directories for query fixtures that materialize temp
  * versioned tables (the engine-replay CORRECTNESS queries). Returned
  * DataFrames are lazy, so the fixture cannot delete its table inline —
  * instead every scratch dir is reclaimed on JVM exit, so repeated
  * bench/verify runs do not accumulate table copies. */
object Scratch {
  private val dirs = new ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    dirs.forEach(p => Try(graft.table.VersionedTable.deleteRecursively(p)): Unit)))

  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }
}

package graft

import java.nio.file.{Files, Path}

/** Tracked temp-dir factory for the suite — every scratch dir any spec
  * creates is registered here and recursively deleted when the forked
  * test JVM exits (`Test / fork := true`, so the hook fires at the end
  * of each `sbt test` run). Before this, a full run left ~160
  * `/tmp/graft-*` dirs behind — the litter class that starved the r9
  * soak of disk.
  *
  * Deletion is best-effort per file (a dir Spark's own shutdown hooks
  * race us on just loses the race — both are deleting); the hook never
  * throws.
  */
object TestTmp {

  private val created = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach(p => deleteRec(p.toFile))))

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }

  /** Create a registered temp directory; deleted at JVM exit. */
  def dir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toFile.getAbsolutePath
  }
}

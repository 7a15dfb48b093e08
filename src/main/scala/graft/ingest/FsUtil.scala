package graft.ingest

/** Local-filesystem helpers shared by the maintenance paths. */
private[ingest] object FsUtil {
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}

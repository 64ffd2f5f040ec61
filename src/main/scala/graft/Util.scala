package graft

/** Small shared filesystem helpers for the dev/driver mains and the DDL
  * scratch management. */
object Util {
  /** Symlink-safe recursive delete (round-16 review: this had drifted into
    * three near-copies — SqlSurface's scratch sweep, Verify's failed-dump
    * removal, and a test helper that silently LACKED the symlink guard).
    * Never follows symlinks — a planted link inside a deleted tree must not
    * reach outside it (same rule as Spark's JavaUtils.deleteRecursively);
    * the link itself is removed. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}

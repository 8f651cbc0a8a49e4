package graft.ops

import java.io.File

/** Shared filesystem helpers for the partition-layout operators
  * (MetadataDelete, RowLevelDelete, plans.Views). One LOUD recursive
  * delete — a failed deletion mid-walk would leave a half-deleted
  * partition (a corrupt parquet layout), so every listFiles/delete
  * result is checked and the first failure aborts with the path.
  */
object FsOps {

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      require(children != null, s"Could not list $f during recursive delete")
      children.foreach(deleteRecursively)
    }
    if (f.exists())
      require(f.delete(), s"Could not delete $f — aborting " +
        "(layout may hold a partially-deleted directory; re-run after " +
        "resolving the permission/concurrent-reader issue)")
  }
}

package graft.pipeline

/** Recursive temp-dir cleanup shared by the bench/verify mains and the
  * checkpoint/journal stores (was copy-pasted per file — review finding).
  */
private[graft] object TempFiles {
  def deleteTree(root: String): Unit = deleteTree(java.nio.file.Paths.get(root))

  def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      // Files.walk holds directory handles open — close the stream, don't
      // wait for GC (this is the cleanup path every bench/gate run hits)
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally s.close()
    }
}

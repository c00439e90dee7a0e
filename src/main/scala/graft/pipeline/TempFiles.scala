package graft.pipeline

/** Recursive temp-dir cleanup shared by the bench/verify mains and the
  * checkpoint/journal stores (was copy-pasted per file — review finding).
  */
private[graft] object TempFiles {
  def deleteTree(root: String): Unit = deleteTree(java.nio.file.Paths.get(root))

  def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
}

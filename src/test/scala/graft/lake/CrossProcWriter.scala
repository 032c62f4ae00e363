package graft.lake

import org.apache.spark.sql.SparkSession

/** Independent-DRIVER writer for ConcurrencySuite's cross-process
  * spec: its own JVM, its own SparkSession, its own [[LakeCatalog]]
  * instance — so none of the in-process state the thread-based
  * concurrency specs share (metadata caches, the catalog object, the
  * JVM's lock tables) exists between racers. The only coordination
  * surface left is the one the commit protocol claims is enough: the
  * warehouse filesystem's atomic create-if-absent
  * (MetadataLog's O_CREAT|O_EXCL version-file CAS).
  *
  * args: warehouse, table, writerId, nAppends. Appends `nAppends`
  * disjoint decades into the writer's own id domain, then row-level
  * DELETEs the upper half of each decade — the mixed append+delete
  * schedule the single-JVM contention spec pins, now from a separate
  * process. Prints `XPROC-DONE <id>` on success; any commit that
  * exhausts auto-retry (or is falsely lost) exits non-zero.
  */
object CrossProcWriter {
  def main(args: Array[String]): Unit = {
    val Array(wh, table, writerIdS, nAppendsS) = args
    val writerId = writerIdS.toInt
    val n = nAppendsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"xproc-writer-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
      .config("spark.sql.catalog.lake.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // barrier: signal readiness (session fully up), then wait for
      // the parent's go-file — so both writers' commit windows
      // genuinely overlap instead of being serialized by JVM
      // startup skew
      val whDir = java.nio.file.Paths.get(wh)
      java.nio.file.Files.write(whDir.resolve(s"xproc-ready-$writerId"),
        Array.emptyByteArray)
      val go = whDir.resolve("xproc-go")
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!java.nio.file.Files.exists(go)) {
        if (System.nanoTime() > deadline)
          sys.error("barrier timeout: parent never released the go-file")
        Thread.sleep(50)
      }
      val lo = writerId * 1000
      for (i <- 0 until n)
        spark.sql(s"INSERT INTO lake.db.$table " +
          s"SELECT id, $writerId FROM " +
          s"range(${lo + i * 100}, ${lo + i * 100 + 10}, 1, 1)")
      spark.sql(s"DELETE FROM lake.db.$table " +
        s"WHERE writer = $writerId AND id % 100 >= 5")
      println(s"XPROC-DONE $writerId")
    } finally spark.stop()
  }
}

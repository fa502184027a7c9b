package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for driving bounded batch-equivalence runs of streaming
  * plans.
  */
object StreamingRun {

  /** Recursive temp-dir delete for the batch-equivalence drivers —
    * closes the `Files.walk` stream (its javadoc requires it) and
    * tolerates already-missing paths, so it is safe from `finally`
    * blocks on partially-created directories.
    */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally walk.close()
    }
  }

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily lowered:
    * a streaming query fixes its STATE partition count from this conf
    * at start, and every state partition owns store instances that
    * checkpoint on every micro-batch (a stream-stream join keeps 4 per
    * partition — 128 stores at the batch default of 32, ~7 s of pure
    * store/commit overhead for kilobytes of state). State partitioning
    * is sized to stateful-key volume, not scan width — the bounded
    * exhibits carry a few thousand keys. At deployment scale this knob
    * is exactly what you tune upward again.
    *
    * The conf is scoped to a CLONED session (`spark.newSession`): the
    * clone shares the SparkContext and cached data but owns its SQLConf,
    * so a query running concurrently on the parent session (parallel
    * tests, ad-hoc work) never silently executes with the lowered
    * partition count. Callers build their streaming frames against the
    * session passed to `f`.
    */
  def withStatePartitions[T](spark: SparkSession, n: Int)(f: SparkSession => T): T = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    f(s)
  }

  /** Stage `batches` as one parquet file each with strictly increasing
    * modification times under a temp directory, run `f` with that
    * directory's path, and delete everything afterwards. With
    * `maxFilesPerTrigger=1` the file source then replays batch i as
    * micro-batch i — the deterministic multi-arrival harness the
    * late-data and appended-state exhibits drive their streams with.
    * Fixed epoch + minute steps stamp the order deterministically
    * however fast the writes ran.
    */
  def withArrivalDir[T](batches: Seq[DataFrame])(f: String => T): T = {
    require(batches.nonEmpty, "withArrivalDir: no arrival batches")
    val base = java.nio.file.Files
      .createTempDirectory("graft_arrivals_").toFile
    try {
      val srcDir = new java.io.File(base, "arrivals")
      require(srcDir.mkdirs(), s"could not create $srcDir")
      batches.zipWithIndex.foreach { case (b, i) =>
        val name = f"b$i%03d"
        val tmp = new java.io.File(base, s"w_$name")
        b.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles()
          .find(x => x.getName.startsWith("part-") &&
            x.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"no part file written for arrival batch $name"))
        val dst = new java.io.File(srcDir, s"$name.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        require(dst.setLastModified(1700000000000L + i * 60000L),
          s"could not stamp arrival order on $dst")
      }
      f(srcDir.getAbsolutePath)
    } finally deleteRecursively(base.toPath)
  }
}

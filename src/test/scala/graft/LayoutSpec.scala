package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout behaviors that carry the 100 TB story: hive-style
  * partition pruning (scan only matching date dirs) and bucketed
  * co-located joins (no shuffle when both sides are bucketed on the
  * join key) — see SCALE_NOTES "Joins".
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("layout-test", "4").getOrCreate()
  import spark.implicits._

  test("partition pruning: date filter reaches PartitionFilters, files skipped") {
    val dir = Files.createTempDirectory("graft_part").toString
    (1 to 300).map(i => (i.toLong, s"2023-01-${i % 3 + 1}"))
      .toDF("id", "dt")
      .write.partitionBy("dt").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).where(col("dt") === "2023-01-2")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    assert(pruned.count() == 100)
    // only one of three partition dirs is actually read
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("2023-01-1") || scanned.contains("PartitionFilters"))
  }

  test("bucketed tables join without a shuffle exchange") {
    val t1 = Files.createTempDirectory("graft_b1").toString
    val t2 = Files.createTempDirectory("graft_b2").toString
    (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", t1).mode("overwrite").saveAsTable("graft_bucket_a")
    (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "w")
      .write.bucketBy(4, "k").sortBy("k")
      .option("path", t2).mode("overwrite").saveAsTable("graft_bucket_b")
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bucket_a")
          .join(spark.table("graft_bucket_b"), Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join must not shuffle:\n$plan")
        assert(joined.count() == 1000)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Dev probe: plans + timings for the aggregate-heavy queries that
  * bench slow (q_approx_distinct, q1) — where does the time go?
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("agg-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[agg] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    val li = Tables.lineitem(spark, d)
    // warm-up
    li.groupBy(col("l_returnflag")).agg(count(lit(1)))
      .write.format("noop").mode("overwrite").save()

    time("scan-only count") {
      li.select(col("l_returnflag"), col("l_orderkey"), col("l_partkey"))
        .write.format("noop").mode("overwrite").save()
    }
    time("two countDistinct + two approx (expand)") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("a"),
          countDistinct(col("l_partkey")).as("b"),
          approx_count_distinct(col("l_orderkey")).as("c"),
          approx_count_distinct(col("l_partkey")).as("d"))
        .write.format("noop").mode("overwrite").save()
    }
    time("two countDistinct only") {
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("a"),
          countDistinct(col("l_partkey")).as("b"))
        .write.format("noop").mode("overwrite").save()
    }
    time("two approx only") {
      li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("c"),
          approx_count_distinct(col("l_partkey")).as("d"))
        .write.format("noop").mode("overwrite").save()
    }
    time("pre-agg union route") {
      val o = li.select(col("l_returnflag"), col("l_orderkey").as("k"))
        .distinct().groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("a"))
      val p = li.select(col("l_returnflag"), col("l_partkey").as("k"))
        .distinct().groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("b"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_orderkey")).as("c"),
          approx_count_distinct(col("l_partkey")).as("d"))
      o.join(p, "l_returnflag").join(ap, "l_returnflag")
        .write.format("noop").mode("overwrite").save()
    }
    li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("a"),
        countDistinct(col("l_partkey")).as("b"),
        approx_count_distinct(col("l_orderkey")).as("c"),
        approx_count_distinct(col("l_partkey")).as("d"))
      .explain("formatted")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Dev probe: where does q1's ~2.2 s go — scan, decimal casts, or the
  * aggregate buffers? Compares decimal vs double vs long-cents money
  * arithmetic on the same aggregation shape.
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("q1-probe", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, "/root/testdata/sf0.1")

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q1] $tag%-28s min=${ts.min}%5.2f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    def m(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def r(c: org.apache.spark.sql.Column) = c.cast(DecimalType(4, 2))
    val oneR = lit(1).cast(DecimalType(4, 2))

    time("scan only (7 cols)") {
      li.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .write.format("noop").mode("overwrite").save()
    }
    time("decimal aggs (current q1)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(m(col("l_extendedprice"))),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount")))),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount")))
            * (oneR + r(col("l_tax")))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    // Narrow-decimal fast path: l_extendedprice < 1e6 fits DECIMAL(8,2),
    // whose sum type DECIMAL(18,2) stays on Spark's long-backed Decimal
    // fast path (precision <= 18). Only plain sums qualify — the product
    // terms widen past 18 digits regardless of the input precision.
    def n(c: org.apache.spark.sql.Column) = c.cast(DecimalType(8, 2))
    time("narrow sum_base_price only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(n(col("l_extendedprice"))))
        .write.format("noop").mode("overwrite").save()
    }
    time("wide sum_base_price only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(m(col("l_extendedprice"))))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 with narrow base price") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(n(col("l_extendedprice"))),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount")))),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount")))
            * (oneR + r(col("l_tax")))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("double aggs (inexact)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** r15 optimization probe: q1's wall is ONE task (single-row-group scan
  * + partial agg fused in one codegen stage) doing ~2 s of per-row
  * BigDecimal work (HeadlineProfile: task_s 1.93, 5 tasks, t/32 0.06).
  * Two orthogonal levers:
  *
  *  1. PARALLELIZE: fanOut (round-robin repartition, no-op at real
  *     scale) moves the decimal work off the single scan task — costs
  *     one 600k-row exchange.
  *  2. CHEAPEN: long-cents arithmetic — round(x*100) longs, products
  *     as pure long multiplies in codegen, sums as DECIMAL(38,0) of
  *     integer addends (compact-long fast path; headroom 1e38 ≫ the
  *     100 TB mass ~6e21), one exact decimal division at the end.
  *     Replaces 3 BigDecimal multiplies + 1 double→decimal cast per
  *     row with 3 long multiplies.
  */
object Q1ParProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.builder("q1-par-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val li = Tables.lineitem(spark, sf)

    def time(tag: String)(f: => Unit): Unit = {
      f // warm (codegen compile off the clock, like the bench warm-up)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q1par] $tag%-34s min=${ts.min}%5.2f s (${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    def m(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def n(c: org.apache.spark.sql.Column) = c.cast(DecimalType(8, 2))
    def r(c: org.apache.spark.sql.Column) = c.cast(DecimalType(4, 2))
    val oneR = lit(1).cast(DecimalType(4, 2))

    def q1decimal(src: org.apache.spark.sql.DataFrame) =
      src.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(n(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(m(col("l_extendedprice")) * (oneR - r(col("l_discount")))
            * (oneR + r(col("l_tax")))).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))

    val d38 = DecimalType(38, 0)
    def q1cents(src: org.apache.spark.sql.DataFrame) = {
      val pc = round(col("l_extendedprice") * 100).cast("long")
      val dc = round(col("l_discount") * 100).cast("long")
      val tc = round(col("l_tax") * 100).cast("long")
      src.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          (sum(pc.cast(d38)) / 100).cast("double").as("sum_base_price"),
          (sum((pc * (lit(100L) - dc)).cast(d38)) / 10000)
            .cast("double").as("sum_disc_price"),
          (sum((pc * (lit(100L) - dc) * (lit(100L) + tc)).cast(d38)) / 1000000)
            .cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }

    /** Split-long: every money sum is TWO primitive long sums (value
      * div K, value mod K) recombined exactly at the end — codegen
      * keeps the aggregate buffers primitive (no Decimal allocation
      * per row). Overflow headroom at 100 TB (1.5e11 rows/group):
      * hi(charge) ≤ 3.8e6 → Σ ≈ 5.7e17 < 9.2e18; lo < K=1e6 →
      * Σ ≈ 1.5e17. ~10³× margin on every component.
      */
    def q1splitFull(src: org.apache.spark.sql.DataFrame) = {
      val pc = round(col("l_extendedprice") * 100).cast("long")
      val dc = round(col("l_discount") * 100).cast("long")
      val tc = round(col("l_tax") * 100).cast("long")
      val disc = pc * (lit(100L) - dc)
      val charge = pc * (lit(100L) - dc) * (lit(100L) + tc)
      val K = lit(1000000L)
      val agged = src.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum((pc / K).cast("long")).as("p_hi"),
          sum(pmod(pc, K)).as("p_lo"),
          sum((disc / K).cast("long")).as("d_hi"),
          sum(pmod(disc, K)).as("d_lo"),
          sum((charge / K).cast("long")).as("c_hi"),
          sum(pmod(charge, K)).as("c_lo"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
      def rec(hi: String, lo: String, den: Long) =
        ((col(hi).cast(d38) * 1000000L + col(lo).cast(d38)) / den)
          .cast("double")
      agged.select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"),
        rec("p_hi", "p_lo", 100L).as("sum_base_price"),
        rec("d_hi", "d_lo", 10000L).as("sum_disc_price"),
        rec("c_hi", "c_lo", 1000000L).as("sum_charge"),
        col("avg_qty"), col("count_order"))
    }

    import graft.ops.Partitioning.fanOut
    // Interleaved rounds: the box swings ±50% minute-to-minute, so
    // back-to-back blocks confound variant with box state. Round-robin
    // puts every variant through the same weather; compare medians.
    val variants: Seq[(String, () => Unit)] = Seq(
      ("A decimal, as-declared", () =>
        q1decimal(li).write.format("noop").mode("overwrite").save()),
      ("C long-cents", () =>
        q1cents(li).write.format("noop").mode("overwrite").save()),
      ("E split-long", () =>
        q1splitFull(li).write.format("noop").mode("overwrite").save()))
    variants.foreach(_._2()) // warm all (codegen off the clock)
    val reps = 7
    val times = Array.fill(variants.length)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    for (_ <- 1 to reps; (v, i) <- variants.zipWithIndex) {
      val t0 = System.nanoTime(); v._2()
      times(i) += (System.nanoTime() - t0) / 1e9
    }
    for (((name, _), i) <- variants.zipWithIndex) {
      val s = times(i).sorted
      println(f"[q1par] $name%-26s med=${s(s.length / 2)}%5.2f min=${s.head}%5.2f " +
        s.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }

    // value identity check: C/E must equal A cell-for-cell (double bits)
    val a = q1decimal(li).orderBy("l_returnflag", "l_linestatus").collect()
    for ((tag, v) <- Seq("cents" -> q1cents(li), "split" -> q1splitFull(li))) {
      val c = v.orderBy("l_returnflag", "l_linestatus").collect()
      val same = a.length == c.length && a.zip(c).forall { case (x, y) =>
        (0 until x.length).forall(i => x.get(i) == y.get(i))
      }
      println(s"[q1par] value identity decimal==$tag: $same")
      if (!same) {
        a.foreach(x => println(s"  A: $x")); c.foreach(x => println(s"  X: $x"))
      }
    }
    spark.stop()
  }
}

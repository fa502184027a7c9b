package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.Salting

/** Prices plain-vs-salted join at a GENUINELY hot key — the probe the
  * round-7 verdict asked for: the declared q_salted_join exhibit proves
  * the identity (salted ≡ plain, oracle-hashed) on benign data; this
  * probe manufactures extreme fact-side skew (one key owning
  * `hotPct`% of all fact rows) and measures what salting actually buys
  * when one reducer would otherwise own the hot key.
  *
  * Three timed variants over the same inputs, all forced to SHUFFLE
  * joins (broadcast off — a broadcastable dim needs no salt):
  *   1. plain, AQE skew-split OFF — the unprotected baseline: the hot
  *      key's rows land on ONE reducer (straggler = the whole join).
  *   2. plain, AQE skew-split ON — Spark's own runtime rescue for
  *      sort-merge joins (what you get for free when stats line up).
  *   3. salted (Salting.saltedJoin, 32 buckets) — the portable form
  *      that also covers shuffled-hash joins and pre-bucketed layouts.
  * Equality is asserted with an order-invariant row checksum
  * (sum of per-row xxhash64) + exact counts.
  *
  * Usage: runMain graft.tools.SkewJoinProbe [factRowsMillions] [hotPct]
  */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val nM = args.headOption.map(_.toInt).getOrElse(20)
    val hotPct = args.lift(1).map(_.toInt).getOrElse(30)
    val n = nM * 1000000L
    val nKeys = 100000L
    val spark = Session.get("skewjoin-probe")

    // fact: hotPct% of rows on key 0, the rest uniform over nKeys
    val fact = spark.range(n)
      .select(
        when(pmod(col("id"), lit(100L)) < hotPct, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(nKeys))).as("k"),
        col("id").as("payload"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dim = spark.range(nKeys)
      .select(col("id").as("k"), md5(col("id").cast("string")).as("attr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val factN = fact.count()
    dim.count()
    System.err.println(s"[skewjoin-probe] $factN fact rows, $nKeys keys, " +
      s"hot key 0 holds ~$hotPct%")

    def checksum(df: DataFrame): (Long, Long) = {
      // pmod keeps the ANSI sum far from Long overflow (2e7 rows × 1e9)
      val r = df.agg(count(lit(1)),
        sum(pmod(xxhash64(col("k"), col("payload"), col("attr")),
          lit(1000000007L)))).head()
      (r.getLong(0), r.getLong(1))
    }
    def timed(name: String, skewSplit: Boolean)(f: => DataFrame): (Double, (Long, Long)) = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      val t0 = System.nanoTime()
      val cs = checksum(f)
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[skewjoin-probe] $name: $sec%.2f s rows=${cs._1}")
      (sec, cs)
    }

    // untimed warmup: codegen + shuffle infra, off the measured runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    fact.sample(0.01).join(dim, Seq("k")).count()

    val (plainSec, plainCs) = timed("plain (no skew split)", skewSplit = false) {
      fact.join(dim, Seq("k"))
    }
    val (aqeSec, aqeCs) = timed("plain (AQE skew split)", skewSplit = true) {
      fact.join(dim, Seq("k"))
    }
    val (saltSec, saltCs) = timed("salted x32", skewSplit = false) {
      Salting.saltedJoin(fact, dim, "k", saltBuckets = 32)
    }
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
    require(plainCs == aqeCs && plainCs == saltCs,
      s"variant outputs diverge: plain=$plainCs aqe=$aqeCs salted=$saltCs")

    println(f"""{"workload":"skew_join","fact_rows":$factN,"keys":$nKeys,"hot_pct":$hotPct,"rows_out":${plainCs._1},"plain_sec":$plainSec%.2f,"aqe_skew_sec":$aqeSec%.2f,"salted_sec":$saltSec%.2f,"identical":true}""")
    spark.stop()
  }
}

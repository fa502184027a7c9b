package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.{Bucketing, SnapshotDiff}

/** Scale probe for SnapshotDiff.maintainJoinViewBucketed — the
  * storage half JoinViewProbe left to "the deployment": A2/B2 written
  * bucketed on the join key (Bucketing.writeBucketed), delta keys
  * literal, so the repair legs are co-located SMJs with bucket
  * pruning. The claim under test: DELTA-APPLY COST SCALES WITH |Δ|,
  * NOT |A| — run at several fact sizes with the same absolute delta
  * and the sliver time should be ~flat; grow the delta 10× at fixed
  * |A| and it should grow ~linearly (plus per-bucket floor).
  *
  * Sliver-only timing trick: calling the maintenance with an EMPTY
  * view zeroes the untouched leg (whose scan is |V|-sized by nature
  * and, at deployment, is not rewritten at all — merge-on-read), so
  * the measured cost is exactly the delta legs. Correctness rides
  * along: the full maintained checksum must equal the direct A2 ⋈ B2
  * recompute's.
  *
  * Usage: runMain graft.tools.BucketedViewProbe [factMillions] [deltaThousands]
  */
object BucketedViewProbe {
  def main(args: Array[String]): Unit = {
    val nA = args.headOption.map(_.toInt).getOrElse(50) * 1000000L
    val deltaK = args.lift(1).map(_.toInt).getOrElse(10) * 1000L
    val nB = 1000000L
    val buckets = 64
    val spark = Session.get("bucketed-view-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val base = System.getProperty("java.io.tmpdir") +
      s"/graft_bvp_${nA / 1000000}m"
    val a2src = spark.range(nA).select(col("id").as("pk"),
      pmod(xxhash64(col("id"), lit(7)), lit(nB)).as("fk"),
      pmod(col("id"), lit(97L)).as("pay"))
    val b2src = spark.range(nB).select(col("id").as("bk"),
      pmod(col("id"), lit(13L)).as("attr"))
    val tw0 = System.nanoTime()
    Bucketing.writeBucketed(a2src, s"graft_bvp_a_${nA / 1000000}m",
      s"$base/a", "fk", buckets)
    Bucketing.writeBucketed(b2src, s"graft_bvp_b_${nA / 1000000}m",
      s"$base/b", "bk", buckets)
    val writeSec = (System.nanoTime() - tw0) / 1e9
    val a2 = Bucketing.readBucketed(spark, s"graft_bvp_a_${nA / 1000000}m")
    val b2 = Bucketing.readBucketed(spark, s"graft_bvp_b_${nA / 1000000}m")

    // deltas: deltaK evenly spread fact pks, deltaK/10 dim bks
    val aKeys = (0L until deltaK).map(i => i * (nA / deltaK))
    val bKeys = (0L until deltaK / 10).map(i => i * (nB / (deltaK / 10)))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("pay") * 31L + col("attr"))).head()
      (r.getLong(0), r.getLong(1))
    }

    // sliver-only: empty view → cost is exactly the delta legs
    val emptyView = a2.join(b2, col("fk") === col("bk")).drop("bk").limit(0)
    val t0 = System.nanoTime()
    val sliver = checksum(SnapshotDiff.maintainJoinViewBucketed(
      emptyView, a2, b2, aKeys, bKeys, "pk", "fk", "bk"))
    val sliverSec = (System.nanoTime() - t0) / 1e9

    // correctness: full maintained == direct recompute (view = the
    // direct join itself — maintenance over an already-current view
    // must be an identity on the checksum)
    val view = a2.join(b2, col("fk") === col("bk")).drop("bk")
    val t1 = System.nanoTime()
    val maint = checksum(SnapshotDiff.maintainJoinViewBucketed(
      view, a2, b2, aKeys, bKeys, "pk", "fk", "bk"))
    val maintSec = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val full = checksum(view)
    val fullSec = (System.nanoTime() - t2) / 1e9

    println(f"""{"workload":"bucketed_view_maintain","fact_rows":$nA,"dim_rows":$nB,"buckets":$buckets,"delta_a_keys":${aKeys.size},"delta_b_keys":${bKeys.size},"write_layout_sec":$writeSec%.1f,"sliver_sec":$sliverSec%.2f,"maintain_full_sec":$maintSec%.1f,"recompute_sec":$fullSec%.1f,"agree":${full == maint}}""")
    spark.stop()
  }
}

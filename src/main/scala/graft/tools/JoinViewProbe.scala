package graft.tools

import org.apache.spark.sql.functions._

import graft.Session
import graft.ops.SnapshotDiff

/** Scale probe for SnapshotDiff.maintainJoinView: a 50M-row fact ⋈
  * 1M-row dim materialized view rolled forward from a 0.1%-key delta
  * on each side, priced against the full A2 ⋈ B2 recompute. Validity
  * is an exact checksum identity: both paths must produce the same
  * (count, sum of a payload expression) — any leg error (double-count,
  * dropped fanout, missed revival) shifts the sums.
  *
  * The premise of view maintenance is that V1 is MATERIALIZED (here:
  * persisted), so the maintain path pays two broadcast anti-probes
  * over V1 plus the repaired slivers, while the full path pays the
  * complete fact-dim shuffle join again.
  *
  * Usage: runMain graft.tools.JoinViewProbe [factMillions] [dimMillions]
  */
object JoinViewProbe {

  def main(args: Array[String]): Unit = {
    val nA = args.headOption.map(_.toInt).getOrElse(50) * 1000000L
    val nB = args.lift(1).map(_.toInt).getOrElse(1) * 1000000L
    val spark = Session.get("joinview-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val a1 = spark.range(nA).select(col("id").as("pk"),
      pmod(xxhash64(col("id"), lit(7)), lit(nB)).as("fk"),
      pmod(col("id"), lit(97L)).as("pay"))
    val b1 = spark.range(nB).select(col("id").as("bk"),
      pmod(col("id"), lit(13L)).as("attr"))
    // v1 materialized — the premise of view maintenance
    val v1 = a1.join(b1, col("fk") === col("bk")).drop("bk")
      .persist(MEMORY_AND_DISK)
    v1.count()

    // 0.1% of fact keys restated, 0.1% of dim keys restated
    val a2 = a1.select(col("pk"), col("fk"),
      when(col("pk") % 1000 === 0, col("pay") + 1000L)
        .otherwise(col("pay")).as("pay"))
      .persist(MEMORY_AND_DISK)
    val b2 = b1.select(col("bk"),
      when(col("bk") % 1000 === 0, col("attr") + 100L)
        .otherwise(col("attr")).as("attr"))
      .persist(MEMORY_AND_DISK)
    a2.count(); b2.count()
    val dA = spark.range(nA / 1000).select((col("id") * 1000).as("pk"))
    val dB = spark.range(nB / 1000).select((col("id") * 1000).as("bk"))

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        sum(col("pay") * 31L + col("attr"))).head()
      (r.getLong(0), r.getLong(1))
    }

    val t0 = System.nanoTime()
    val full = checksum(a2.join(b2, col("fk") === col("bk")).drop("bk"))
    val fullSec = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val maint = checksum(SnapshotDiff.maintainJoinView(
      v1, a2, b2, dA, dB, "pk", "fk", "bk"))
    val maintSec = (System.nanoTime() - t1) / 1e9

    println(f"[joinview-probe] factRows=$nA%d dimRows=$nB%d " +
      f"deltaKeys=0.1%% full_join=$fullSec%.1f s " +
      f"maintain=$maintSec%.1f s " +
      f"agree=${if (full == maint) "OK" else s"BROKEN $full vs $maint"}")
    spark.stop()
  }
}

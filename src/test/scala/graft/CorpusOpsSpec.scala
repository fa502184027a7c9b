package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{RangeJoin, Sampling}
import graft.text.TfIdf

class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("corpus-test", "4").getOrCreate()
  import spark.implicits._

  test("feature hashing: md5 buckets, signed counts, padded serialization") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def idx(t: String): Long =
      java.lang.Long.parseLong(md5hex(t).substring(0, 4), 16) % 64
    def sgn(t: String): Long =
      if (java.lang.Long.parseLong(md5hex(t).substring(4, 5), 16) % 2 == 0)
        1L else -1L
    // "x x y": x contributes twice -> value 2*sgn(x) in bucket idx(x)
    val out = TfIdf.featureHash(
        Seq((1L, "x x y")).toDF("doc_id", "text"), "doc_id", "text", 64)
      .collect().head
    val expected =
      Seq(idx("x") -> 2 * sgn("x"), idx("y") -> sgn("y"))
        .groupMapReduce(_._1)(_._2)(_ + _).toSeq.filter(_._2 != 0)
        .map { case (i, v) => f"$i%02d:$v%d" }.sorted.mkString(";")
    assert(out.getLong(out.fieldIndex("n_nonzero")) ==
      expected.split(";").count(_.nonEmpty))
    assert(out.getString(out.fieldIndex("features")) == expected)
  }

  test("feature hashing: pad width grows with dim, no lpad truncation") {
    // dim = 4096 -> pad width 4; a fixed width-3 lpad would truncate
    // any bucket index >= 1000 to its first 3 digits (ADVICE r12).
    val out = TfIdf.featureHash(
        Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
          .toDF("doc_id", "text"), "doc_id", "text", 4096)
      .collect().head
    val labels = out.getString(out.fieldIndex("features"))
      .split(";").map(_.split(":")(0))
    assert(labels.forall(_.length == 4),
      s"expected width-4 labels, got ${labels.mkString(",")}")
    // zero-padded order == numeric order
    assert(labels.map(_.toInt).sorted.sameElements(
      labels.sorted.map(_.toInt)))
  }

  test("tf-idf top terms: ranks by tf desc, df asc, term asc") {
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana banana apple"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val top = TfIdf.topTermsPerDoc(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: apple tf=2 wins; then banana/cherry tf=1 — cherry df=2 <
    // banana df=2? both df=2 → term asc: banana
    assert(top((1L, 1)) == ("apple", 2L, 2L))
    assert(top((1L, 2)) == ("banana", 1L, 2L))
    assert(top((2L, 1)) == ("banana", 3L, 2L))
    assert(top((3L, 1)) == ("date", 1L, 1L)) // df=1 beats cherry df=2 at tf=1
    assert(top((3L, 2)) == ("cherry", 1L, 2L))
  }

  test("inverted index: df band pre-filters, postings sorted, tf parallel") {
    val docs = Seq(
      (3L, "a b a b c"),   // bigrams: "a b"×2, "b a", "b c"
      (1L, "a b x"),       // "a b", "b x"
      (2L, "z b c"))       // "z b", "b c"
      .toDF("doc_id", "text")
    val idx = TfIdf.invertedIndex(docs, "doc_id", "text",
        n = 2, minDf = 2L, maxDf = 50L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](2), r.getSeq[Long](3))).toMap
    // band 2..50 keeps only "a b" (df 2) and "b c" (df 2); the df-1
    // grams ("b a", "b x", "z b") are dropped BEFORE any list builds
    assert(idx.keySet == Set("a b", "b c"))
    // postings ascending by doc_id with the PARALLEL tf array:
    // doc 3 has "a b" twice
    assert(idx("a b") == (2L, Seq(1L, 3L), Seq(1L, 2L)))
    assert(idx("b c") == (2L, Seq(2L, 3L), Seq(1L, 1L)))
    // unigram mode: every term has df <= 3; band [3,3] keeps only 'b'
    val uni = TfIdf.invertedIndex(docs, "doc_id", "text",
        n = 1, minDf = 3L, maxDf = 3L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](2)).toMap
    assert(uni == Map("b" -> Seq(1L, 2L, 3L)))
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("range join matches naive inequality join exactly, no duplicates") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 11L, ts("2024-01-01 11:00:00")),
      (2L, 12L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    // right rows straddle bucket boundaries around each left ts
    val right = (0 until 200).map { i =>
      (1L + (i % 2), 100L + i, ts(f"2024-01-01 ${9 + i % 4}%02d:${i % 60}%02d:00"))
    }.toDF("user_id", "event_id", "ts")
    val got = RangeJoin.withinSeconds(left, right, "user_id", "event_id",
      "ts", toleranceSec = 600L)
      .select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.toDF("u", "lid", "lts").join(right.toDF("u", "rid", "rts"), "u")
      .where(abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= 600L * 1000000L)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == naive.sorted.toSeq) // set AND multiplicity
    assert(got.length == got.distinct.length, "no duplicate pairs")
  }

  test("top-k aggregator equals sort-and-take, aggregates partially") {
    import graft.functions.TopKAggregator
    val rnd = new scala.util.Random(7)
    val data = Seq.tabulate(5000)(i => (i % 13).toLong -> rnd.nextDouble())
    val df = data.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(TopKAggregator.top_k(5)(col("v")).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val expect = data.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted(Ordering[Double].reverse).take(5)
    }
    expect.foreach { case (g, top) => assert(got(g) == top, s"group $g") }
    // partial->final: the plan must aggregate before AND after the
    // exchange (the whole point vs the window formulation)
    val plan = df.groupBy("g")
      .agg(TopKAggregator.top_k(5)(col("v")))
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("(?i)partial".r.findFirstIn(plan).isDefined, plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("text functions propagate null text, never crash") {
    import graft.text.{TextFunctions => TF}
    val df = Seq((1L, "some text here"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val out = df.select(col("id"),
      TF.tokenCount(col("t")).as("n"),
      TF.qualityScore(col("t")).as("q"),
      TF.langIdGuess(col("t")).as("l"),
      TF.contentFingerprint(col("t")).as("fp"),
      TF.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 3)
    val nullRow = out(2L)
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(5))
    // qualityScore is an indicator SUM: null text fails every band -> 0.0
    assert(nullRow.getDouble(2) == 0.0)
    // concat_ws skips null arrays -> fingerprint of null text = md5("")
    assert(nullRow.getString(4) == "d41d8cd98f00b204e9800998ecf8427e")
    // tf-idf / dedup shingle paths drop null docs rather than crash
    assert(graft.text.TfIdf.topTermsPerDoc(df, "id", "t", 3)
      .where(col("doc_id") === 2L).count() == 0)
  }

  test("pii redaction masks emails and phones, order-stable") {
    import graft.text.{TextFunctions => TF}
    val df = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or call 555-123-4567 today"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.io and 999.888.7777")).toDF("id", "t")
    val out = df.select(col("id"),
      TF.redactPii(col("t")).as("clean"),
      TF.countMatches(col("t"), TF.emailPattern).as("ne"),
      TF.countMatches(col("t"), TF.phonePattern).as("np"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ("mail me at <EMAIL> or call <PHONE> today", 1, 1))
    assert(out(2L) == ("no pii here", 0, 0))
    assert(out(3L)._1 == "two mails <EMAIL> <EMAIL> and <PHONE>")
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
  }

  test("hash sampling: deterministic, rate-accurate, subset-consistent") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.sampleByKey(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByKey(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    assert(a == b, "same selection every run")
    assert(math.abs(a.size - 2500) < 250, s"~25% of 10k, got ${a.size}")
    // nested rates: a 10% sample is a subset of the 25% sample
    val c = Sampling.sampleByKey(df, col("id"), 0.10).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a), "thresholds nest")
  }

  test("source mixing: per-source rates, unlisted sources dropped") {
    import spark.implicits._
    val df = spark.range(8000)
      .select(col("id"),
        concat(lit("s"), pmod(col("id"), lit(4))).as("src"))
    val out = Sampling.mixSources(df, col("id"), col("src"),
      Map("s0" -> 1.0, "s1" -> 0.25))
      .groupBy(col("src")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("s0", "s1"), "s2/s3 must be dropped")
    assert(out("s0") >= 1990, s"rate-1.0 source nearly complete: $out")
    assert(math.abs(out("s1") - 500) < 120, s"~25% of 2000: $out")
    // selection per key matches sampleByKey at the same rate
    val mixed = Sampling.mixSources(df, col("id"), col("src"),
      Map("s1" -> 0.25)).collect().map(_.getLong(0)).toSet
    val direct = Sampling.sampleByKey(df.where(col("src") === "s1"),
      col("id"), 0.25).collect().map(_.getLong(0)).toSet
    assert(mixed == direct)
  }

  test("sequence packing: prefix-sum bins, shard-local, budget respected at boundaries") {
    import spark.implicits._
    // shard 0 only (ids 0,2,4,... with shards=2): token counts 3,4,5,...
    val df = Seq((0L, 300), (2L, 400), (4L, 500), (6L, 100), (1L, 250))
      .toDF("doc_id", "n")
    val out = graft.ops.Packing.packSequences(df, "doc_id", col("n"),
      budget = 512, shards = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    // shard 0 stream: id0 start 0 bin 0; id2 start 300 bin 0;
    // id4 start 700 bin 1; id6 start 1200 bin 2
    assert(out(0L) == (0L, 0L, 0L))
    assert(out(2L) == (0L, 300L, 0L))
    assert(out(4L) == (0L, 700L, 1L))
    assert(out(6L) == (0L, 1200L, 2L))
    // shard 1 independent: id1 starts its own stream
    assert(out(1L) == (1L, 0L, 0L))
  }

  test("dataset split: exhaustive, disjoint, stable under corpus growth") {
    val keys = spark.range(4000).toDF("k")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.assignSplit(keys, col("k"), splits)
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row in exactly one split (withColumn can't drop/dup rows,
    // but the CASE must be exhaustive: no nulls)
    assert(counts.values.sum == 4000L)
    assert(assigned.where(col("split").isNull).count() == 0)
    // proportions near the spec (md5 is uniform; 4000 keys, ±4 sigma)
    assert(math.abs(counts("train") - 3200L) < 100,
      s"train=${counts("train")}")
    assert(math.abs(counts("val") - 400L) < 80, s"val=${counts("val")}")
    // append-stability: the first 1000 keys get the SAME split when the
    // corpus is 4x larger — assignment depends only on the key
    val small = Sampling.assignSplit(spark.range(1000).toDF("k"),
        col("k"), splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val big = assigned.where(col("k") < 1000)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(small == big)
    // bad specs rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(keys, col("k"), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("leak-free split: near-dup cluster members share one split, singletons keep plain assignment") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val ids = spark.range(100).toDF("doc_id")
    // clusters: {3,57,91} (chain 3-57, 57-91) and {10,44}; rest singletons
    val pairs = Seq((3L, 57L), (57L, 91L), (10L, 44L)).toDF("id_a", "id_b")
    val out = Sampling.leakFreeSplit(ids, "doc_id", pairs, splits)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rep"), r.getAs[String]("split"))).toMap
    assert(out.size == 100)
    // whole cluster inherits the min-id representative's split
    assert(out(3L)._1 == 3L && out(57L)._1 == 3L && out(91L)._1 == 3L)
    assert(out(57L)._2 == out(3L)._2 && out(91L)._2 == out(3L)._2)
    assert(out(10L)._1 == 10L && out(44L)._1 == 10L)
    assert(out(44L)._2 == out(10L)._2)
    // singleton assignment identical to plain assignSplit on its own id
    val plain = Sampling.assignSplit(ids, col("doc_id"), splits)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val singles = (0L until 100L).toSet -- Set(3L, 57L, 91L, 10L, 44L)
    singles.foreach(id => assert(out(id) == ((id, plain(id)))))
    // cluster members take the REP's draw (44's own draw is irrelevant)
    assert(out(44L)._2 == plain(10L))
  }

  test("unpivot inverts the hour pivot to the plain long-form counts") {
    import graft.ops.HourPivot
    val ev = Seq(
      ("2024-01-01 03:15:00", "click"), ("2024-01-01 03:45:00", "click"),
      ("2024-01-01 07:00:00", "click"), ("2024-01-02 03:10:00", "view"))
      .toDF("tss", "event_type")
      .select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val long = HourPivot.unpivot(
      HourPivot.pivot(ev, col("ts"), Seq("event_type")), Seq("event_type"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getInt(2)) -> r.getLong(3)).toMap
    assert(long == Map(
      ("2024-01-01", "click", 3) -> 2L, ("2024-01-01", "click", 7) -> 1L,
      ("2024-01-02", "view", 3) -> 1L)) // zero cells dropped
  }

  test("resample+ffill: hourly grid per key, latest-in-bucket wins, gaps carried") {
    import graft.ops.Resample
    val hourUs = 3600000000L
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:10:00", 1.0),
      (1L, 11L, "2024-01-01 00:50:00", 2.0), // same bucket, later ts wins
      (1L, 12L, "2024-01-01 03:20:00", 9.0), // hours 1-2 are gaps
      (2L, 20L, "2024-01-01 05:00:00", 7.0))
      .toDF("user_id", "event_id", "tss", "value")
      .select(col("user_id"), col("event_id"),
        to_timestamp(col("tss")).as("ts"), col("value"))
    val out = Resample.resampleFfill(ev, "user_id", "ts", "event_id",
      "value", hourUs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(2)), r.getDouble(3))).toMap
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    assert(out.size == 5) // user1: hours 0..3; user2: hour 5 only
    assert(out((1L, base)) == ((Some(2.0), 2.0)))
    assert(out((1L, base + hourUs)) == ((None, 2.0)))  // gap, carried
    assert(out((1L, base + 2 * hourUs)) == ((None, 2.0)))
    assert(out((1L, base + 3 * hourUs)) == ((Some(9.0), 9.0)))
    assert(out((2L, base + 5 * hourUs)) == ((Some(7.0), 7.0)))
  }

  test("anomaly flags: spike flagged after warm-up, flat series never") {
    import graft.ops.Resample
    // key 1: constant 5.0 except one spike at bucket 30; key 2: flat
    val rows = (0 until 40).map(i =>
      (1L, i * 100L, if (i == 30) 50.0 else 5.0)) ++
      (0 until 40).map(i => (2L, i * 100L, 5.0))
    val ser = rows.toDF("user_id", "bucket_us", "v_ffill")
    // z=2: a lone spike inside its own trailing window tops out at
    // z = (n-1)/sqrt(n) ≈ 2.85 for n=10 (at z=3 the inequality lands
    // EXACTLY on equality — verified by hand — and strict > never fires)
    val out = Resample.anomalyFlags(ser, "user_id", window = 10, z = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    // warm-up rows (n_win < 10) never flag
    (0 until 9).foreach(i => assert(out((1L, i * 100L)) == ((i + 1L, false))))
    // the spike is the only flagged bucket of key 1
    val flagged1 = out.collect { case ((1L, b), (_, true)) => b }
    assert(flagged1.toSeq == Seq(3000L), s"flagged $flagged1")
    // flat series: variance 0 on both sides of the strict > — no flags
    assert(out.collect { case ((2L, b), (_, true)) => b }.isEmpty)
  }

  test("portable HLL: registers merge by max, estimate lands near truth") {
    import graft.ops.Sketches
    val items = spark.range(20000)
      .select((col("id") % 2).cast("string").as("src"),
        concat(lit("k"), (col("id") % 7919)).as("key")) // 7919 distinct
    val global = Sketches.hllRegisters(items, "key")
      .collect().map(r => r.getAs[String]("bucket") -> r.getAs[Int]("m_reg")).toMap
    // merge law: max-merge of per-source registers == global registers
    val perSrc = Sketches.hllRegisters(items, "key", Seq("src"))
    val merged = perSrc.groupBy(col("bucket"))
      .agg(max(col("m_reg")).as("m_reg"))
      .collect().map(r => r.getAs[String]("bucket") -> r.getAs[Int]("m_reg")).toMap
    assert(merged == global)
    // raw estimate within HLL's expected error band (~1.04/sqrt(256) ≈ 6.5%)
    val est = Sketches.hllEstimate(Sketches.hllRegisters(items, "key"))
      .collect()(0).getAs[Double]("hll_raw_estimate")
    assert(math.abs(est - 7919.0) / 7919.0 < 0.2, s"estimate $est")
    // duplicate-insensitive: feeding each key once gives the same sketch
    val once = Sketches.hllRegisters(
      spark.range(7919).select(concat(lit("k"), col("id")).as("key")), "key")
      .collect().map(r => r.getAs[String]("bucket") -> r.getAs[Int]("m_reg")).toMap
    assert(once == global)
  }

  test("cms join-size estimate: upper-bounds truth, exact when collision-free") {
    import graft.ops.Sketches
    // A: keys 1,1,2,3  B: keys 1,2,2,9 — true join = 2*1 + 1*2 = 4
    val a = Seq("1", "1", "2", "3").toDF("k")
    val b = Seq("1", "2", "2", "9").toDF("k")
    val est = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsSketch(a, "k", d = 4),
      Sketches.cmsSketch(b, "k", d = 4))
      .head().getLong(0)
    // 4 keys over 256 md5 buckets: at least one of the 4 hash rows is
    // collision-free for these FIXED keys, so min == truth exactly
    assert(est == 4L, s"est $est")
    // heavy skew: self-join of a hot key — estimate >= sum c^2
    val hot = spark.range(100).select(lit("hot").as("k"))
      .union(spark.range(10).select(concat(lit("t"), col("id")).as("k")))
    val selfEst = Sketches.cmsJoinSizeEstimate(
      Sketches.cmsSketch(hot, "k", d = 4),
      Sketches.cmsSketch(hot, "k", d = 4)).head().getLong(0)
    assert(selfEst >= 100L * 100 + 10, s"self-join est $selfEst")
  }

  test("hll overlap: identical sets overlap fully, inclusion-exclusion tracks truth") {
    import graft.ops.Sketches
    def keys(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(concat(lit("k"), col("id")).as("key"))
    def regs(lo: Int, hi: Int) = Sketches.hllRegisters(keys(lo, hi), "key")
    // identical sets: union sketch == either sketch, so the algebra is
    // EXACT: est_overlap == est_a == est_b, no tolerance needed
    val same = Sketches.hllOverlap(regs(0, 5000), regs(0, 5000)).head()
    assert(same.getDouble(0) == same.getDouble(1))
    assert(same.getDouble(3) == same.getDouble(0))
    // 0..6000 vs 4000..10000: true overlap 2000 of 6000 each — the
    // estimate should land within the raw-HLL error band
    val part = Sketches.hllOverlap(regs(0, 6000), regs(4000, 10000)).head()
    assert(math.abs(part.getDouble(3) - 2000.0) / 2000.0 < 0.35,
      s"overlap ${part.getDouble(3)}")
    // and est_union <= est_a + est_b by construction
    assert(part.getDouble(2) <= part.getDouble(0) + part.getDouble(1))
  }

  test("geo neighbor join: finds cross-cell pairs once, respects the radius exactly") {
    import graft.ops.GeoJoin
    // r=100: (1,2) dist2=8² → in; (1,3) 100² boundary → in (<=);
    // (2,3) straddles a cell edge; (4,*) far away; (5,6) just outside
    val pts = Seq((1L, 50L, 50L), (2L, 58L, 50L), (3L, 150L, 50L),
      (4L, 900L, 900L), (5L, 300L, 300L), (6L, 300L, 401L))
      .toDF("id", "x", "y")
    val out = GeoJoin.neighborPairs(pts, "id", "x", "y", radius = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(out((1L, 2L)) == 64L)
    assert(out((1L, 3L)) == 10000L) // exactly on the boundary, kept
    // each pair appears exactly once despite the 9-cell probe
    val n = GeoJoin.neighborPairs(pts, "id", "x", "y", radius = 100L).count()
    assert(n == 3L)
  }

  test("quality classifier: ppm weights and scores match hand arithmetic") {
    import graft.text.QualityClassifier
    val train = Seq((1L, "good nice good nice", true),
      (2L, "bad ugly bad ugly", false),
      (3L, "meh", true), (4L, "meh", false)).toDF("doc_id", "text", "lab")
    val w = QualityClassifier.trainTokenWeights(train, "text", col("lab"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("w_ppm")).toMap
    // good: 10⁶·(2+1) div (2+0+2); bad: 10⁶·(0+1) div 4; meh: 2/4
    assert(w == Map("good" -> 750000L, "nice" -> 750000L,
      "bad" -> 250000L, "ugly" -> 250000L, "meh" -> 500000L))
    val score = Seq((10L, "good meh"), (11L, "bad meh"), (12L, "zz qq"))
      .toDF("doc_id", "text")
    val s = QualityClassifier.scoreDocs(score, "doc_id", "text",
      QualityClassifier.trainTokenWeights(train, "text", col("lab")))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score_ppm"), r.getAs[Boolean]("pred_pos"))).toMap
    assert(s(10L) == ((625000L, true)))
    assert(s(11L) == ((375000L, false)))
    assert(s(12L) == ((500000L, true))) // OOV everywhere → exactly the prior
  }

  test("bloom-pruned join equals the plain join; guardrail skips the sketch") {
    import graft.ops.BloomJoin
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c"), (2L, "d"))
      .toDF("k", "payload")
    val build = Seq((2L, "x"), (9L, "y")).toDF("bk", "attr")
    val pruned = BloomJoin.bloomPrunedJoin(fact, build, "k", "bk")
      .select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(pruned == Set(Seq(2L, "b", "x"), Seq(2L, "d", "x")))
    // past maxBuildKeys DISTINCT keys the operator returns the plain
    // join (no bloom literal in the plan) rather than a giant broadcast
    val guarded = BloomJoin.bloomPrunedJoin(fact, build, "k", "bk",
      maxBuildKeys = 1L)
    // duplicated keys must NOT trip the key-count guardrail: 4 rows,
    // 2 distinct keys, cap 3 → sketch still applies. The fact side is
    // range-based (not a LocalRelation) so the optimizer can't fold
    // the bloom filter away before the plan assertion sees it.
    val dupBuild = Seq((2L, "x"), (2L, "x2"), (9L, "y"), (9L, "y2"))
      .toDF("bk", "attr")
    val factR = spark.range(1, 5)
      .select(col("id").as("k"), concat(lit("p"), col("id")).as("payload"))
    val dupPruned = BloomJoin.bloomPrunedJoin(factR, dupBuild,
      "k", "bk", maxBuildKeys = 3L)
    assert(dupPruned.queryExecution.executedPlan.toString
      .contains("might_contain"))
    assert(dupPruned.select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet ==
      Set(Seq(2L, "p2", "x"), Seq(2L, "p2", "x2")))
    // and the same 4-row build WOULD trip a row-count guardrail — prove
    // the cap counts keys, not rows, by also asserting the inverse
    val rowGuard = BloomJoin.bloomPrunedJoin(factR, dupBuild,
      "k", "bk", maxBuildKeys = 1L)
    assert(!rowGuard.queryExecution.executedPlan.toString
      .contains("might_contain"))
    assert(!guarded.queryExecution.executedPlan.toString
      .contains("might_contain"))
    assert(guarded.select("k", "payload", "attr")
      .collect().map(_.toSeq).toSet == pruned)
  }

  test("rolling HLL merge includes buckets absent on the anchor day") {
    import graft.ops.Sketches
    import java.sql.Date
    // hand-built register table: bucket "aa" seen ONLY on day 1 —
    // a naive rolling window over present rows would drop it from
    // day 3's trailing-3-day merge; the day-spine join must keep it
    val regs = Seq(
      (Date.valueOf("2024-01-01"), "aa", 5),
      (Date.valueOf("2024-01-03"), "bb", 2),
      (Date.valueOf("2024-01-03"), "aa", 1), // lower rho later: max wins
      (Date.valueOf("2024-01-09"), "cc", 7))
      .toDF("day", "bucket", "m_reg")
    val est = Sketches.hllRollingEstimate(regs, "day", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est("2024-01-01") == 1L) // aa only
    assert(est("2024-01-03") == 2L) // aa (max rho 5, from day 1) + bb
    assert(est("2024-01-09") == 1L) // cc only — day 3 aged out
    val merged = Sketches.hllRollingEstimate(regs, "day", 3)
      .where(col("day") === "2024-01-03").head()
    assert(merged.getLong(1) == 2L)
    // default spine = days present → the gap day 2024-01-02 has no row
    assert(!est.contains("2024-01-02"))
    // an explicit day spine fills the gap: day 2's trailing-3 window
    // reaches back to day 1's "aa" register
    val spine = Seq(Date.valueOf("2024-01-02")).toDF("d")
    val gap = Sketches.hllRollingEstimate(regs, "day", 3, Some(spine))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(gap("2024-01-02") == 1L)
  }

  test("temperature mix (tau=1/2): max source complete, tail flattened to sqrt ratio") {
    import graft.ops.Sampling
    // A: 6400 docs (w=80), B: 100 docs (w=10) → p_B = 10/80 = 0.125
    val docs = ((1L to 6400L).map(i => ("A", i)) ++
      (10001L to 10100L).map(i => ("B", i))).toDF("source", "doc_id")
    val kept = Sampling.temperatureMixSqrt(docs, col("source"), col("doc_id"))
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // p = 1 → COMPLETE, including any digest in the 'ffffffff' tail
    assert(bySrc("A") == 6400L)
    // B at p = 0.125 over a uniform digest draw: ~12.5 of 100 expected
    val b = bySrc.getOrElse("B", 0L)
    assert(b > 0 && b < 40, s"B kept $b of 100 at p=0.125")
    // deterministic: re-running selects the identical keeper set
    val first = kept.where(col("source") === "B")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.temperatureMixSqrt(docs, col("source"), col("doc_id"))
      .where(col("source") === "B")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first == again)
    // a NULL source must fail loudly, not silently vanish from the
    // null-unsafe keep join while skewing w_max
    val withNull = docs.unionByName(
      Seq((null.asInstanceOf[String], 99999L)).toDF("source", "doc_id"))
    val ex = intercept[IllegalArgumentException] {
      Sampling.temperatureMixSqrt(withNull, col("source"), col("doc_id"))
    }
    assert(ex.getMessage.contains("null source"))
  }

  test("token-budget sample: keeps the md5-order prefix, straddler included") {
    import graft.ops.Sampling
    val docs = (1L to 40L).map(i => (i, "s", 10L)).toDF("id", "src", "n")
    val kept = Sampling.tokenBudgetSample(docs, col("id"), col("src"),
      col("n"), budget = 95L)
    // exclusive running sum < 95 in md5(id) order → exactly 10 docs
    // (9 fit fully at 90; the 10th straddles and is included)
    assert(kept.count() == 10L)
    // equivalence with the single-window formulation (the oracle rule)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(md5(col("id").cast("string")), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("cb", coalesce(sum(col("n")).over(w), lit(0L)))
      .where(col("cb") < 95L).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.select("id").collect().map(_.getLong(0)).toSet == expected)
    // budget larger than the corpus keeps everything
    assert(Sampling.tokenBudgetSample(docs, col("id"), col("src"),
      col("n"), budget = 100000L).count() == 40L)
  }

  test("bigram LM: smoothing cases and floor-divided mean match hand arithmetic") {
    import graft.text.NgramLm
    // training corpus: "a b" ×2, "a c" ×1  →  c1(a)=3, c1(b)=2, c1(c)=1
    // (b and c also start bigrams "b a" / "c a"? no — docs are 2 tokens)
    val trusted = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(trusted, "text")
    val v = m.vocab.collect().head.getLong(0)
    assert(v == 3L) // {a, b, c}
    val cond = m.bigram.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("cond_ppm")).toMap
    // c1(a)=3 (appears 3×): "a b": 10⁶·(2+1) div (3+3) = 500000
    //                       "a c": 10⁶·(1+1) div (3+3) = 333333
    assert(cond == Map("a b" -> 500000L, "a c" -> 333333L))
    val bo = m.backoff.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("bo_ppm")).toMap
    // backoff 10⁶ div (c1+v): a→166666, b→200000, c→250000
    assert(bo == Map("a" -> 166666L, "b" -> 200000L, "c" -> 250000L))
    // score: "a b a c" → bigrams [a b, b a, a c]:
    //   observed 500000, backoff(b) 200000, observed 333333
    //   sum 1033333 div 3 = 344444
    // "z z" → OOV history: 10⁶ div 3 = 333333
    val docs = Seq((10L, "a b a c"), (11L, "z z"), (12L, "a"))
      .toDF("doc_id", "text")
    val s = NgramLm.score(docs, "doc_id", "text", m).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_score_ppm"))).toMap
    assert(s(10L) == ((3L, 344444L)))
    assert(s(11L) == ((1L, 333333L)))
    assert(!s.contains(12L)) // single-token doc: no bigrams, absent
  }

  test("snapshot diff classifies adds/removes/changes; apply round-trips") {
    import graft.ops.SnapshotDiff
    val oldS = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, null.asInstanceOf[String], 40L)).toDF("k", "s", "v")
    val newS = Seq((1L, "a", 10L), (2L, "B", 20L), (5L, "e", 50L),
      (4L, "", 40L)).toDF("k", "s", "v") // 3 removed, 2 changed, 5 added
    val d = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("s", "v"))
    val types = d.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    // NULL → "" is a CHANGE (the 0x02 sentinel keeps them distinct)
    assert(types == Map(2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "changed"))
    assert(d.where(col("k") === 2L).select("new_s").as[String].head() == "B")
    // law: apply(old, diff(old, new)) == new
    val rolled = SnapshotDiff.apply(oldS, d, Seq("k"), Seq("s", "v"))
    assert(rolled.count() == newS.count())
    assert(rolled.exceptAll(newS).count() == 0
      && newS.exceptAll(rolled).count() == 0)
    // identical snapshots → empty changeset
    assert(SnapshotDiff.diff(oldS, oldS, Seq("k"), Seq("s", "v")).count() == 0)
  }

  test("join-view maintenance law covers fk moves, dim deletes, orphan revivals") {
    import graft.ops.SnapshotDiff
    // facts: (pk, fk, payload). Edge cases packed in:
    //  pk 1 unchanged on unchanged dim; pk 2 MOVES fk 10 → 20;
    //  pk 3 removed; pk 6 added; pk 4 points at a dim that gets
    //  DELETED; pk 5 was an orphan (fk 40 absent in B1) whose dim
    //  gets ADDED in B2 — the revival only a dim-delta leg catches.
    val a1 = Seq((1L, 10L, "p1"), (2L, 10L, "p2"), (3L, 20L, "p3"),
      (4L, 30L, "p4"), (5L, 40L, "p5")).toDF("pk", "fk", "pay")
    val a2 = Seq((1L, 10L, "p1"), (2L, 20L, "p2"), (4L, 30L, "p4"),
      (5L, 40L, "p5"), (6L, 20L, "p6")).toDF("pk", "fk", "pay")
    val b1 = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("bk", "attr")
    val b2 = Seq((10L, "x"), (20L, "Y2"), (40L, "w")).toDF("bk", "attr")
    val v1 = a1.join(b1, col("fk") === col("bk")).drop("bk")
    val dA = SnapshotDiff.diff(a1, a2, Seq("pk"), Seq("fk", "pay"))
      .select(col("pk"))
    val dB = SnapshotDiff.diff(b1, b2, Seq("bk"), Seq("attr"))
      .select(col("bk"))
    val v2 = SnapshotDiff.maintainJoinView(v1, a2, b2, dA, dB,
      "pk", "fk", "bk")
    val direct = a2.join(b2, col("fk") === col("bk")).drop("bk")
    assert(v2.count() == direct.count())
    assert(v2.exceptAll(direct).count() == 0
      && direct.exceptAll(v2).count() == 0)
    // spot the revival: orphan pk 5 is IN the maintained view now
    assert(v2.where(col("pk") === 5L).count() == 1)
    // and the dim delete dropped pk 4
    assert(v2.where(col("pk") === 4L).count() == 0)

    // the BUCKETED/literal-key variant obeys the same law on the same
    // fixture (storage layout changes the plan, never the algebra) —
    // plus a null-fk fact that a bare NOT IN would silently drop
    val a2n = a2.unionByName(
      Seq((7L, Option.empty[Long], "p7")).toDF("pk", "fk", "pay"))
    val aKeyList = dA.as[Long].collect().toSeq :+ 7L
    val bKeyList = dB.as[Long].collect().toSeq
    val v2b = SnapshotDiff.maintainJoinViewBucketed(v1, a2n, b2,
      aKeyList, bKeyList, "pk", "fk", "bk")
    val directN = a2n.join(b2, col("fk") === col("bk")).drop("bk")
    assert(v2b.exceptAll(directN).count() == 0
      && directN.exceptAll(v2b).count() == 0)
    // empty deltas → the view IS the answer (and nothing null-drops)
    val vSame = SnapshotDiff.maintainJoinViewBucketed(v1, a1, b1,
      Seq.empty, Seq.empty, "pk", "fk", "bk")
    assert(vSame.exceptAll(v1).count() == 0
      && v1.exceptAll(vSame).count() == 0)
  }

  test("group quantile filter: matches per-group rank reference, ties survive") {
    import graft.ops.GroupQuantile
    // group a: values 1..8 (p25 threshold = 2: cum 2/8 = .25 >= .25)
    // group b: heavy ties at 5 — all of them must survive a p25 cut
    val df = ((1 to 8).map(v => ("a", v.toLong)) ++
      Seq(("b", 1L), ("b", 5L), ("b", 5L), ("b", 5L))).toDF("g", "v")
      .repartition(4)
    val kept = GroupQuantile.filterAtQuantile(df, Seq(col("g")), col("v"), 0.25)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val keptA = kept.filter(_._1 == "a").map(_._2).sorted
    val keptB = kept.filter(_._1 == "b").map(_._2).sorted
    assert(keptA.toSeq == (2L to 8L)) // drops only v=1 (strictly below thr)
    // b: thr = smallest v with cum/4 >= .25 → v=1 (cum 1/4 = .25) →
    // EVERYTHING survives: ties + lower-quantile semantics, no rank split
    assert(keptB.toSeq == Seq(1L, 5L, 5L, 5L))
    // schema untouched: no temp columns leak
    assert(GroupQuantile.filterAtQuantile(df, Seq(col("g")), col("v"), 0.5)
      .columns.toSeq == Seq("g", "v"))
  }

  test("vocab coverage: ranks by frequency, cum share monotone to total") {
    import graft.text.TextFunctions
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d"), (3L, "")) // 9 tokens
      .toDF("doc_id", "text")
    val cov = TextFunctions.vocabCoverage(docs, "text", k = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(cov.map(x => (x._1, x._2, x._3)).toSeq ==
      Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 1L))) // c before d: tiebreak
    assert(cov(0)._4 == 4.0 / 9 && cov(1)._4 == 7.0 / 9 && cov(2)._4 == 8.0 / 9)
  }

  test("common n-grams: document frequency, not raw count; k + tiebreak") {
    import graft.text.TextFunctions
    val docs = Seq(
      (1L, "x y z x y z x y z"), // "x y z" repeats 3x in ONE doc → df 1
      (2L, "a b c d"),           // "a b c", "b c d"
      (3L, "a b c q"),           // "a b c" again → df 2
      (4L, "a b")                // too short: no 3-grams
    ).toDF("doc_id", "text")
    val top = TextFunctions.commonNgrams(docs, "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // df winner first; then ties broken by gram string ascending
    assert(top.head == ("a b c", 2L))
    assert(top.length == 3)
    assert(top(1)._2 == 1L && top(1)._1 < top(2)._1)
    // the within-doc repeat did NOT inflate df
    assert(top.forall { case (g, n) => g != "x y z" || n == 1L })
  }

  test("shuffled index: exact permutation, matches naive global window, partition-invariant") {
    val docs = spark.range(0, 300).toDF("doc_id")
    val out = Sampling.shuffledIndex(docs, col("doc_id"), seed = 42L,
      shardSize = 64L).collect()
    // positions are exactly 1..N
    assert(out.map(_.getLong(1)).sorted.toSeq == (1L to 300L))
    // shard = (pos-1) div 64
    assert(out.forall(r => r.getLong(2) == (r.getLong(1) - 1) / 64))
    // equals the naive single-partition formulation
    val naive = docs
      .withColumn("k", md5(concat(col("doc_id").cast("string"), lit(":42"))))
      .withColumn("p", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("doc_id"))))
      .select(col("doc_id"), col("p")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.forall(r => naive(r.getLong(0)) == r.getLong(1)))
    // parallelism-invariant (the reproducibility contract)
    val rep = Sampling.shuffledIndex(docs.repartition(7), col("doc_id"),
      seed = 42L).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall(r => rep(r.getLong(0)) == r.getLong(1)))
  }

  test("char pairs: adjacent bigrams, short tokens empty, never crashes") {
    import graft.text.TextFunctions
    val rows = Seq("hash", "ab", "x", "").toDF("tok")
      .select(col("tok"), TextFunctions.charPairs(col("tok")).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("hash") == Seq("ha", "as", "sh"))
    assert(rows("ab") == Seq("ab"))
    assert(rows("x").isEmpty && rows("").isEmpty)
  }

  test("BPE training: hand-checked 3-round trajectory with greedy merges and ties") {
    import graft.text.TextFunctions
    // tokens: aa, ab, aab, aa
    // r1: (a,a)=3 [aa, aab, aa], (a,b)=2 → merge (a,a)
    //     aa→[aa], ab→[a,b], aab→[aa,b] (greedy leftmost), aa→[aa]
    // r2: (a,b)=1, (aa,b)=1 — tie on n → lexicographic: "a" < "aa" → (a,b)
    // r3: only (aa,b)=1 remains
    val docs = Seq((1L, "aa ab"), (2L, "aab aa")).toDF("doc_id", "text")
    val merges = TextFunctions.bpeTrainMerges(docs, "text", rounds = 3)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq((1, "a", "a", 3L), (2, "a", "b", 1L),
      (3, "aa", "b", 1L)), merges.toString)
    // saturation: asking for more merges than the corpus supports
    // returns the learnable table (the HF/sentencepiece contract),
    // never throws — exactly 3 merges exist above.
    val sat = TextFunctions.bpeTrainMerges(docs, "text", rounds = 1000)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(sat == merges, sat.toString)
  }

  test("BPE training matches a reference implementation on random corpora") {
    import graft.text.TextFunctions
    // reference: greedy left-to-right merges, (count DESC, l, r) argmax
    def refBpe(docs: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
      var corpus: Seq[Vector[String]] = docs
        .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .map(_.map(_.toString).toVector)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val counts = corpus.flatMap(t =>
          if (t.size < 2) Nil
          else (0 until t.size - 1).map(i => (t(i), t(i + 1))))
          .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
        if (counts.isEmpty) done = true
        else {
          val ((l, rr), n) = counts.minBy { case ((l, rr), n) => (-n, l, rr) }
          out += ((l, rr, n))
          corpus = corpus.map { t =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < t.size) {
              if (i + 1 < t.size && t(i) == l && t(i + 1) == rr) {
                b += (l + rr); i += 2
              } else { b += t(i); i += 1 }
            }
            b.result()
          }
          r += 1
        }
      }
      out.toSeq
    }
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = Seq.fill(1 + rnd.nextInt(3))(
        Seq.fill(1 + rnd.nextInt(8))(
          Seq.fill(1 + rnd.nextInt(6))("abc" (rnd.nextInt(3))).mkString)
          .mkString(" "))
      val expected = refBpe(docs, 3)
      if (expected.size == 3) { // skip corpora that run dry early
        val got = TextFunctions.bpeTrainMerges(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), "text", rounds = 3)
          .orderBy("round")
          .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
        assert(got == expected, s"seed=$seed docs=$docs:\n  $got\n  $expected")
      }
    }
  }

  test("BPE batch verification truncates when a created pair outranks a batch member") {
    import graft.text.TextFunctions
    // token "Azy"×5 + token "bc"×5: the batch accepts [(A,z),(b,c)]
    // (disjoint, consecutive in (n DESC,l,r) order), but merging (A,z)
    // CREATES (Az,y) with count 5, which ties (b,c)=5 and wins the
    // UTF-8 tie ("Az" < "b") — the sequential trajectory merges (Az,y)
    // second. The delta verify must catch that and truncate the batch.
    val docs = ((1 to 5).map(i => (i.toLong, "Azy")) ++
      (6 to 10).map(i => (i.toLong, "bc"))).toDF("doc_id", "text")
    val merges = TextFunctions.bpeTrainMerges(docs, "text", rounds = 3)
      .orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(merges == Seq((1, "A", "z", 5L), (2, "Az", "y", 5L),
      (3, "b", "c", 5L)), merges.toString)
  }

  test("BPE batched training matches the reference on wide-alphabet corpora") {
    import graft.text.TextFunctions
    // same reference as above, but a 12-letter alphabet and longer
    // words so candidate pairs are often DISJOINT — the batch path
    // (kEff >= 2) actually runs, unlike the 3-letter corpora
    def refBpe(docs: Seq[String], rounds: Int): Seq[(String, String, Long)] = {
      var corpus: Seq[Vector[String]] = docs
        .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .map(_.map(_.toString).toVector)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var r = 0
      var done = false
      while (r < rounds && !done) {
        val counts = corpus.flatMap(t =>
          if (t.size < 2) Nil
          else (0 until t.size - 1).map(i => (t(i), t(i + 1))))
          .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
        if (counts.isEmpty) done = true
        else {
          val ((l, rr), n) = counts.minBy { case ((l, rr), _n) => (-_n, l, rr) }
          out += ((l, rr, n))
          corpus = corpus.map { t =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < t.size) {
              if (i + 1 < t.size && t(i) == l && t(i + 1) == rr) {
                b += (l + rr); i += 2
              } else { b += t(i); i += 1 }
            }
            b.result()
          }
          r += 1
        }
      }
      out.toSeq
    }
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(1000 + seed)
      val docs = Seq.fill(3)(
        Seq.fill(10 + rnd.nextInt(10))(
          Seq.fill(2 + rnd.nextInt(7))("abcdefghijkl" (rnd.nextInt(12)))
            .mkString).mkString(" "))
      val expected = refBpe(docs, 8)
      if (expected.size == 8) {
        val got = TextFunctions.bpeTrainMerges(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), "text", rounds = 8)
          .orderBy("round")
          .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
        assert(got == expected, s"seed=$seed docs=$docs:\n  $got\n  $expected")
      }
    }
  }

  test("BPE encode: native BpeEncode expression matches a reference encode at 40 merges") {
    import graft.text.TextFunctions
    // encode is ONE native expression with the merge table as foldable
    // array literals — the plan stays O(1) in merge count, and the
    // result must equal the reference's sequential greedy application
    val rnd = new scala.util.Random(77)
    val docs = Seq.fill(5)(
      Seq.fill(12)(Seq.fill(3 + rnd.nextInt(6))("abcdefghij" (rnd.nextInt(10)))
        .mkString).mkString(" "))
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = TextFunctions.bpeTrainMerges(df, "text", rounds = 40)
      .orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 40)
    def refApply(tok: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < tok.size) {
        if (i + 1 < tok.size && tok(i) == l && tok(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += tok(i); i += 1 }
      }
      b.result()
    }
    val expected = docs.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .map(_.map(_.toString).toVector)
      .map(t => merges.foldLeft(t) { case (v, (l, r)) => refApply(v, l, r) })
      .flatten.groupBy(identity).map { case (s, v) => s -> v.size }
    val got = TextFunctions.bpeEncodeSymbols(df, "text", merges)
      .groupBy(col("symbol")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(got == expected, s"\n  got=$got\n  exp=$expected")
  }

  test("BPE encode: non-BMP code points are single symbols, matching the trainer's unit") {
    import graft.text.TextFunctions
    // U+1F600 is one code point but two UTF-16 chars — the native
    // encoder must split by CODE POINT like the trainer's substr(i,1)
    // (UTF8String counts code points), or a surrogate pair would be
    // torn into two invalid half-symbols
    val emoji = new String(Character.toChars(0x1F600))
    val docs = Seq((1L, s"a${emoji}b a${emoji}b")).toDF("doc_id", "text")
    // merge (a, emoji) then (a+emoji, b): every token collapses fully
    val merges = Seq(("a", emoji), ("a" + emoji, "b"))
    val syms = TextFunctions.bpeEncodeSymbols(docs, "text", merges)
      .collect().map(_.getString(0)).toSeq
    assert(syms == Seq(s"a${emoji}b", s"a${emoji}b"), syms.toString)
  }

  test("BPE encode: duplicate merge-table pairs re-merge at their later rank") {
    import graft.text.TextFunctions
    // A later merge whose output equals a pair's left symbol can
    // recreate an already-merged pair: with table [(xy,z), (x,y),
    // (xy,z)] on "xyz", pass 0 is a no-op (no "xy" symbol yet),
    // pass 1 builds it, and the pass fold merges (xy,z) at the
    // DUPLICATE's rank 2. An encoder that kept only the lowest rank
    // would skip it (0 < pointer) and emit ["xy","z"].
    val docs = Seq((1L, "xyz")).toDF("doc_id", "text")
    val merges = Seq(("xy", "z"), ("x", "y"), ("xy", "z"))
    val syms = TextFunctions.bpeEncodeSymbols(docs, "text", merges)
      .collect().map(_.getString(0)).toSeq
    assert(syms == Seq("xyz"), syms.toString)
  }

  test("BPE batching is trajectory-invariant: batchSize 1 and 32 agree on random corpora") {
    import graft.text.TextFunctions
    // direct equivalence proof of the batched selection, independent of
    // any reference implementation: batchSize=1 IS the sequential
    // trainer, so any batching unsoundness shows up as a divergence
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(2000 + seed)
      val docs = Seq.fill(4)(
        Seq.fill(8 + rnd.nextInt(8))(
          Seq.fill(2 + rnd.nextInt(6))("abcdefgh" (rnd.nextInt(8)))
            .mkString).mkString(" "))
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val seq1 = TextFunctions.bpeTrainMerges(docs, "text", rounds = 6,
        batchSize = 1).orderBy("round").collect().map(_.toSeq).toSeq
      val seq32 = TextFunctions.bpeTrainMerges(docs, "text", rounds = 6,
        batchSize = 32).orderBy("round").collect().map(_.toSeq).toSeq
      assert(seq1 == seq32, s"seed=$seed:\n  $seq1\n  $seq32")
    }
  }

  test("CMS: estimates dominate exact counts; clear heavy hitters rank exactly") {
    import graft.ops.Sketches
    // zipf-ish: token t_i appears (50 - i) times → exact ranking known
    val rows = (0 until 40).flatMap(i => Seq.fill(50 - i)(s"t$i"))
    val items = rows.toDF("key")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = Sketches.cmsHeavyHitters(items, "key", d = 4, k = 40)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS never under-counts
    est.foreach { case (k, e) =>
      assert(e >= exact(k), s"$k: estimate $e < exact ${exact(k)}")
    }
    // with 40 keys in 256 buckets × 4 rows, collisions are unlikely to
    // perturb the TOP of the ranking: the heaviest key must rank first
    val top = Sketches.cmsHeavyHitters(items, "key", d = 4, k = 1)
      .collect().head
    assert(top.getString(0) == "t0", top.toString)
  }

  test("source drift: hand-checked L1, zero on identical, two on disjoint") {
    import graft.text.TextFunctions
    // A: {a:2/3, b:1/3}, B: {a:1/2, c:1/2} → L1 = 1/6 + 1/3 + 1/2 = 1
    val docs = Seq(("A", "a a b"), ("B", "a c"), ("C", "a a b"),
      ("D", "x y z")).toDF("source", "text")
    val drift = TextFunctions.sourceTokenDrift(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(drift(("A", "B")) - 1.0) < 1e-15, drift.toString)
    assert(drift(("A", "C")) == 0.0, "identical distributions must be 0")
    assert(drift(("A", "D")) == 2.0, "disjoint vocabularies must be 2")
    assert(drift.size == 6, "every source pair must emit")
  }

  test("chunking: stride windows, short tail, empty docs dropped") {
    import graft.text.TextFunctions
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens → starts 0,3,6 at stride 3
      (2L, "")).toDF("doc_id", "text")
    val out = TextFunctions.chunkDocs(docs, "doc_id", "text",
      chunkTokens = 4, stride = 3).collect()
    assert(out.forall(_.getLong(0) == 1L)) // empty doc produced nothing
    val byChunk = out.map(r => r.getInt(1) -> (r.getInt(2), r.getInt(3))).toMap
    assert(byChunk == Map(0 -> (0, 4), 1 -> (3, 4), 2 -> (6, 1)))
  }

  test("vocab encode: ids follow frequency rank, OOV null, positions 1-based") {
    import graft.text.TextFunctions
    val docs = Seq(
      (1L, "b a a"), (2L, "a c")).toDF("doc_id", "text")
    // freq: a=3, b=1, c=1 → vocab size 2 keeps a(1), b(2); c is OOV
    val out = TextFunctions.vocabEncode(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(out((1L, 1)) == ("b", Some(2)))
    assert(out((1L, 2)) == ("a", Some(1)))
    assert(out((2L, 2)) == ("c", None))
  }

  test("bm25: rarer term outranks common term at equal tf; doc-id tiebreak") {
    import graft.text.Bm25
    // "rare" appears in 1 doc, "common" in 3; doc 1 and 2 have equal
    // length; doc 1 holds the rare term → must outscore doc 2
    val docs = Seq(
      (1L, "rare common filler words here"),
      (2L, "common filler words here again"),
      (3L, "common filler words here again"),
      (4L, "filler words only in this doc")).toDF("doc_id", "text")
    val out = Bm25.search(docs, "doc_id", "text",
      terms = Seq("rare", "common"), k = 4).collect()
    assert(out.map(_.getLong(0)).head == 1L)
    val scores = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    // docs 2 and 3 are identical → equal scores, id order decides
    assert(scores(2L) == scores(3L))
    val order = out.map(_.getLong(0)).toSeq
    assert(order.indexOf(2L) < order.indexOf(3L))
    // doc 4 matches nothing → score 0, still present (left join), last
    assert(scores(4L) == 0.0 && order.last == 4L)
  }

  test("source drift: DECIMAL algebra exact at 10^12-token-per-source counts") {
    // n_a*N_b here reaches 3*10^24 — past BIGINT (9.2*10^18), the old
    // overflow cliff. The BigInt reference is ground truth.
    val counts = Seq(
      ("A", "t1", 400000000000L), ("A", "t2", 600000000000L),
      ("B", "t1", 1000000000000L), ("B", "t3", 2000000000000L),
      ("C", "t4", 700000000000L))
    val got = graft.text.TextFunctions.driftFromCounts(
        counts.toDF("src", "t", "n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    def drift(a: String, b: String): Double = {
      val ca = counts.filter(_._1 == a).map(x => x._2 -> BigInt(x._3)).toMap
      val cb = counts.filter(_._1 == b).map(x => x._2 -> BigInt(x._3)).toMap
      val (na, nb) = (ca.values.sum, cb.values.sum)
      val num = (ca.keySet ++ cb.keySet).toSeq.map { t =>
        (ca.getOrElse(t, BigInt(0)) * nb - cb.getOrElse(t, BigInt(0)) * na).abs
      }.sum
      num.toDouble / (na * nb).toDouble
    }
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    for (((a, b), v) <- got) assert(v == drift(a, b), s"pair ($a,$b)")
    // disjoint vocabularies (A,C) must land at exactly 2
    assert(got(("A", "C")) == 2.0)
  }

  test("weighted negative samples: naive interval replay + weight bias") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.NegativeSampling
    val k = 3
    // id 6 passes the 0.5 md5 pool filter and carries 100x weight
    val df = spark.range(300).select(col("id").as("doc_id"),
      when(col("id") === 6, 1000L).otherwise(lit(10L)).as("wt"))
    val got = NegativeSampling.negativeSamplesWeighted(
      df, "doc_id", "wt", k, poolRate = 0.5, oversample = 3,
      indexBuckets = 16)

    // naive replay: one global window over the same bucket-major order
    val pool = df.select(col("doc_id").as("neg_id"),
        col("wt").cast("long").as("w"))
      .where(md5(col("neg_id").cast("string")) <
        lit(Sampling.hexThreshold(0.5)))
      .where(col("w") > 0)
    val iv = pool.withColumn("lo", coalesce(sum("w").over(
        Window.orderBy(pmod(col("neg_id"), lit(16L)), col("neg_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("hi", col("lo") + col("w"))
    val totalW = pool.agg(sum("w")).head().getLong(0)
    val m = k * 3
    val draws = df.select(col("doc_id").as("anchor_id"))
      .crossJoin(spark.range(m).select(col("id").as("j")))
      .withColumn("u", pmod(conv(substring(md5(concat_ws(":",
        col("anchor_id"), col("j"))), 1, 13), 16, 10).cast("long"),
        lit(totalW)))
    val want = draws.join(iv,
        col("u") >= col("lo") && col("u") < col("hi"))
      .where(col("neg_id") =!= col("anchor_id"))
      .groupBy("anchor_id", "neg_id").agg(min("j").as("j"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy("j")).cast("int"))
      .where(col("rank") <= k).select("anchor_id", "rank", "neg_id")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)

    // bias: id 6 owns ~40% of the weight line -> drawn for most anchors
    val anchorsWithHeavy = got.where(col("neg_id") === 6L)
      .select("anchor_id").distinct().count()
    assert(anchorsWithHeavy > 200,
      s"heavy doc drawn for only $anchorsWithHeavy/300 anchors")
    val perAnchor = got.collect().groupBy(_.getLong(0)).values.map(_.length)
    assert(perAnchor.forall(_ <= k))
  }

  test("negative samples by index: matches a naive replay of the draw spec") {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.NegativeSampling
    val k = 3
    val ids = spark.range(200).select(col("id").as("doc_id"))
    val got = NegativeSampling.negativeSamplesByIndex(
      ids, "doc_id", k, poolRate = 0.3, oversample = 3, indexBuckets = 16)

    // naive replay of the spec with global windows (fine at 200 rows)
    val pool = ids.select(col("doc_id").as("neg_id"))
      .where(md5(col("neg_id").cast("string")) <
        lit(Sampling.hexThreshold(0.3)))
    val idx = pool.withColumn("pidx", row_number().over(
      Window.orderBy(pmod(col("neg_id"), lit(16L)), col("neg_id"))) - 1)
    val pn = pool.count()
    val m = k * 3
    val draws = ids.select(col("doc_id").as("anchor_id"))
      .crossJoin(spark.range(m).select(col("id").as("j")))
      .withColumn("pidx", pmod(conv(substring(md5(concat_ws(":",
        col("anchor_id"), col("j"))), 1, 13), 16, 10).cast("long"),
        lit(pn)))
    val want = draws.join(idx, "pidx")
      .where(col("neg_id") =!= col("anchor_id"))
      .groupBy("anchor_id", "neg_id").agg(min("j").as("j"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("anchor_id").orderBy("j")).cast("int"))
      .where(col("rank") <= k).select("anchor_id", "rank", "neg_id")
    assert(got.exceptAll(want).count() == 0 &&
      want.exceptAll(got).count() == 0)

    // contract checks: no self-negatives, ≤k per anchor, negatives ⊆ pool
    val rows = got.collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)))
    val perAnchor = rows.groupBy(_.getLong(0)).values.map(_.length)
    assert(perAnchor.forall(_ <= k) && perAnchor.exists(_ == k))
    val poolSet = pool.collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => poolSet.contains(r.getLong(2))))
  }

  test("tClosenessAudit: hand-computed ordered EMD, skew flagged") {
    import graft.ops.Privacy
    // cohorts a=(0,0), b=(1,1), c=(0,1) → global bands 3/3 (N=6, m=2).
    // a: cum diff at band 0 = |2·6 − 3·2| = 6 → emd_ppm =
    // 6·10⁶/(2·6·1) = 500000 (EMD 0.5, skewed). b: |0·6 − 3·2| = 6 →
    // 500000. c mirrors the global split exactly → 0.
    val df = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L),
      ("c", 0L), ("c", 1L)).toDF("g", "band")
    val out = Privacy.tClosenessAudit(df, Seq("g"), col("band"),
      tPpm = 250000L)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out("a") == ((2L, 500000L, 0)))
    assert(out("b") == ((2L, 500000L, 0)))
    assert(out("c") == ((2L, 0L, 1)))
  }

  test("changepoint bestSplit: level shift found, means exact, tie to earliest") {
    import graft.ops.Changepoint
    val days = (1 to 5).map(i => java.sql.Date.valueOf(f"2024-01-0$i%d"))
    // one event row per (day, count) unit: day i carries v_i rows
    val vals = Seq(1, 1, 1, 9, 9)
    val rows = days.zip(vals).flatMap { case (d, v) =>
      Seq.fill(v)(("k", d)) }
    val out = Changepoint.bestSplit(rows.toDF("k", "d"),
      col("k"), col("d"), count(lit(1))).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("split_day") == days(2)) // after day 3
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("mean_before_milli") == 1000L)
    assert(r.getAs[Long]("mean_after_milli") == 9000L)
    // hand value: num = 3·21−... L=3,n=5,S=21 → |15−63| = 48;
    // 48²·1000/(3·2) = 384000
    assert(r.getAs[Long]("obj_scaled") == 384000L)
    // constant series: every split scores 0 → tie breaks to day 1
    val flat = days.map(d => ("k", d)).toDF("k", "d")
    val f = Changepoint.bestSplit(flat, col("k"), col("d"),
      count(lit(1))).collect().head
    assert(f.getAs[Long]("obj_scaled") == 0L)
    assert(f.getAs[java.sql.Date]("split_day") == days(0))
  }

  test("withReadability: integer Flesch pieces, clamps at zero counts") {
    import graft.text.TextFunctions
    val df = Seq((1L, "ab. cd ef"), (2L, "")).toDF("doc_id", "text")
    val out = TextFunctions.withReadability(df, "text")
      .collect().map(r => (r.getLong(0),
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_sentences"),
          r.getAs[Long]("n_vowel_groups"), r.getAs[Long]("flesch_milli"))))
      .toMap
    // words = 3 ("ab." "cd" "ef"), sentences = 1 ("."), vowel groups =
    // "a","e" → 2; 206835 − 1015·3/1 − 84600·2 div 3 = 147390
    assert(out(1L) == ((3L, 1L, 2L, 147390L)))
    // empty text: all clamps to 1 → 206835 − 1015 − 84600 = 121220
    assert(out(2L) == ((1L, 1L, 1L, 121220L)))
  }

  test("hammingNearDupsAcross: cross-set only, threshold exact") {
    import graft.text.Dedup
    val probe = Seq((1L, 0L), (2L, -1L)).toDF("id", "h")
    val index = Seq((10L, 1L), (11L, 7L), (12L, 0L)).toDF("id", "h")
    val out = Dedup.hammingNearDupsAcross(probe, index, "id", "h",
        maxHamming = 3, chunks = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
      .toMap
    // probe 1 (0x0): vs 10 (1 bit), 11 (3 bits), 12 (0 bits) — all ≤ 3
    // probe 2 (all ones): 63, 61, 64 bits away — none pass, and no
    // band can even match except... chunk 0xFFFF never equals any
    assert(out == Map((1L, 10L) -> 1, (1L, 11L) -> 3, (1L, 12L) -> 0))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Experiment

class ExperimentSpec extends AnyFunSuite {
  lazy val spark = Session.builder("experiment-test", "4").getOrCreate()
  import spark.implicits._

  test("diff-in-diff: hand-computed four-cell estimate") {
    import org.apache.spark.sql.functions._
    // treat pre {1,3}->2, post {5,7}->6 (delta 4);
    // ctrl pre {2}->2, post {3,3}->3 (delta 1); did = 3
    val df = Seq((1, false, 1.0), (1, false, 3.0), (1, true, 5.0),
      (1, true, 7.0), (0, false, 2.0), (0, true, 3.0), (0, true, 3.0))
      .toDF("arm", "post", "v")
    val r = Experiment.diffInDifferences(df, col("arm"), col("post"),
      col("v")).collect().head
    assert(r.getDouble(r.fieldIndex("delta_treat")) == 4.0)
    assert(r.getDouble(r.fieldIndex("delta_ctrl")) == 1.0)
    assert(r.getDouble(r.fieldIndex("did")) == 3.0)
    assert(r.getLong(r.fieldIndex("n_t1")) == 2L &&
      r.getLong(r.fieldIndex("n_c0")) == 1L)
  }

  test("cuped: perfectly-correlated covariate absorbs all variance") {
    import org.apache.spark.sql.functions._
    // y = 2x exactly -> theta 2, var_ratio 0, and both arms' adjusted
    // means collapse to 2*x-bar = 5.0 while raw means differ (3 vs 7)
    val df = Seq((0, 1.0, 2.0), (0, 2.0, 4.0), (1, 3.0, 6.0), (1, 4.0, 8.0))
      .toDF("arm", "x", "y")
    val out = Experiment.cupedAdjust(df, col("y"), col("x"), col("arm"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getDouble(out(0).fieldIndex("theta")) == 2.0)
    assert(math.abs(out(0).getDouble(out(0).fieldIndex("var_ratio"))) < 1e-12)
    assert(out(0).getDouble(out(0).fieldIndex("mean_raw")) == 3.0)
    assert(out(1).getDouble(out(1).fieldIndex("mean_raw")) == 7.0)
    assert(out(0).getDouble(out(0).fieldIndex("mean_adj")) == 5.0)
    assert(out(1).getDouble(out(1).fieldIndex("mean_adj")) == 5.0)
  }

  test("two-sample z: hand-computed Welch z, degenerate arms -> NULL") {
    val df = Seq(
      // group m: arm0 {1,3} (mean 2, var 2), arm1 {2,6} (mean 4, var 8)
      ("m", 0, 1.0), ("m", 0, 3.0), ("m", 1, 2.0), ("m", 1, 6.0),
      // group one: a single arm-0 observation -> z NULL
      ("one", 0, 5.0), ("one", 1, 1.0), ("one", 1, 2.0),
      // group flat: identical values in both arms -> se 0 -> z NULL
      ("flat", 0, 7.0), ("flat", 0, 7.0), ("flat", 1, 7.0), ("flat", 1, 7.0))
      .toDF("g", "arm", "v")
    val out = Experiment.twoSampleZ(df, "g", "arm", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.get(5))).toMap
    val (na, nb, ma, mb, z) = out("m")
    assert((na, nb, ma, mb) == (2L, 2L, 2.0, 4.0))
    // z = (2-4)/sqrt(2/2 + 8/2) = -2/sqrt(5)
    assert(math.abs(z.asInstanceOf[Double] - (-2.0 / math.sqrt(5.0))) < 1e-12)
    assert(out("one")._5 == null)
    assert(out("flat")._5 == null)
    assert(out("flat")._3 == 7.0 && out("flat")._4 == 7.0)
  }

  test("two-sample z: rounding-negative variance clamps, never emits NaN") {
    // Three 6.70s: the moments are exact DECIMAL, but replaying the
    // double tree (ss − s²/n)/(n−1) gives ~−1.4e-14 — and Spark's
    // `NaN > 0.0` is TRUE (NaN sorts above all numbers), so without
    // the clamp sqrt(negative) leaks z = NaN. greatest(var, 0.0)
    // turns arm 0 into a zero-variance arm and the Welch z comes
    // from arm 1's variance alone.
    val df = Seq(
      ("g", 0, 6.70), ("g", 0, 6.70), ("g", 0, 6.70),
      ("g", 1, 1.0), ("g", 1, 3.0))
      .toDF("g", "arm", "v")
    val z = Experiment.twoSampleZ(df, "g", "arm", "v")
      .collect().head.get(5)
    assert(z != null, "z must be defined (arm 1 has real variance)")
    val zd = z.asInstanceOf[Double]
    assert(!zd.isNaN, s"z is NaN: the variance clamp is missing")
    // mean_a 6.7, mean_b 2, var_b 2 -> z = (6.7-2)/sqrt(0 + 2/2)
    assert(math.abs(zd - (6.7 - 2.0)) < 1e-9, zd.toString)
  }

  test("chi-square cells: hand-computed 2x2 contingency") {
    // observed: (x,0)=30 (x,1)=10 (y,0)=10 (y,1)=50 -> margins
    // rt x=40 y=60, ct 0=40 1=60, grand 100
    val rows = Seq.fill(30)(("x", 0)) ++ Seq.fill(10)(("x", 1)) ++
      Seq.fill(10)(("y", 0)) ++ Seq.fill(50)(("y", 1))
    val df = rows.toDF("a", "b")
    val out = Experiment.chiSquareCells(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(("x", 0)) == (30L, 16.0, 196.0 / 16.0))
    assert(out(("x", 1)) == (10L, 24.0, 196.0 / 24.0))
    assert(out(("y", 0)) == (10L, 24.0, 196.0 / 24.0))
    assert(out(("y", 1)) == (50L, 36.0, 196.0 / 36.0))
    // chi2 statistic = sum of contributions ~= 22.685
    val stat = out.values.map(_._3).sum
    assert(math.abs(stat - (12.25 + 196.0 / 24 * 2 + 196.0 / 36)) < 1e-12)
  }

  test("cohens kappa: textbook 2x2, disjoint domains, constant raters") {
    // classic example: n=50, agree=20+15=35, marginals a:(25,25) b:(30,20)
    // pe_num = 25*30 + 25*20 = 1250, kappa = (35*50-1250)/(2500-1250) = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val out = Experiment.cohensKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(out.getLong(0) == 50L && out.getLong(1) == 35L)
    assert(out.getDouble(2) == 0.4)

    // disjoint label domains: zero agreement, zero chance agreement
    val disj = Seq(("x", "u"), ("y", "v")).toDF("a", "b")
    val d = Experiment.cohensKappa(disj, "a", "b").head()
    assert(d.getLong(0) == 2L && d.getLong(1) == 0L && d.getDouble(2) == 0.0)

    // both raters constant and agreeing: denominator 0 -> NULL
    val const = Seq(("k", "k"), ("k", "k")).toDF("a", "b")
    val c = Experiment.cohensKappa(const, "a", "b").head()
    assert(c.getLong(1) == 2L && c.isNullAt(2))
  }

  test("exact AUC: separable, midrank ties, constant scores, one-class NULL") {
    import graft.ops.Eval
    def auc(rows: Seq[(Double, Long)]) = Eval.aucExact(
      rows.zipWithIndex.map { case ((s, y), i) => (s, y, i.toLong) }
        .toDF("score", "y", "id"), "score", "y", "id").head()

    // perfectly separable
    val a = auc(Seq((0.1, 0L), (0.2, 0L), (0.3, 1L), (0.4, 1L)))
    assert(a.getLong(0) == 2L && a.getLong(1) == 2L && a.getDouble(2) == 1.0)
    // hand-worked midrank case: scores 1,2,2,3 / y 0,1,0,1
    // ranks 1,(2.5,2.5),4 -> R+ = 6.5, U = 3.5, AUC = 0.875
    val b = auc(Seq((1.0, 0L), (2.0, 1L), (2.0, 0L), (3.0, 1L)))
    assert(b.getDouble(2) == 0.875)
    // all scores equal: AUC exactly 1/2
    val cc = auc(Seq((5.0, 0L), (5.0, 1L), (5.0, 0L), (5.0, 1L)))
    assert(cc.getDouble(2) == 0.5)
    // one class only -> NULL
    val d = auc(Seq((0.1, 1L), (0.2, 1L)))
    assert(d.isNullAt(2))
  }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ingest.{PathMeta, SchemaDetector}
import graft.util.SizeParser

/** Property-based tests (SURVEY §5 strategy item 2) for the pure
  * driver-side logic: detection stability and path parsing. Plain
  * ScalaCheck Properties (the scalatest bridge isn't in the offline
  * dependency cache).
  */
object PropertySpec extends Properties("graft") {

  private val noiseCol: Gen[String] = Gen.alphaNumStr.suchThat { s =>
    val l = s.toLowerCase
    s.nonEmpty && !l.contains("pickup") && !l.contains("request") &&
      !l.contains("location") && !l.contains("zone") &&
      !l.contains("lat") && !l.contains("lon") && !l.contains("time") &&
      !l.contains("date")
  }

  property("detection stable under permutation and casing") =
    forAll(Gen.listOfN(4, noiseCol), Gen.oneOf(true, false), Gen.long) {
      (noise, upper, seed) =>
        val base = Seq("tpep_pickup_datetime", "PULocationID")
        val cols = new scala.util.Random(seed).shuffle(
          (base ++ noise).map(c => if (upper) c.toUpperCase else c))
        SchemaDetector.detect(cols) match {
          case Right(d) => d.dtCol.equalsIgnoreCase("tpep_pickup_datetime")
          case Left(_) => false
        }
    }

  property("detection never invents column names") =
    forAll(Gen.listOfN(6, Gen.alphaNumStr.suchThat(_.nonEmpty))) { cols =>
      SchemaDetector.detect(cols) match {
        case Right(d) =>
          cols.contains(d.dtCol) && (d.location match {
            case SchemaDetector.LocId(c) => cols.contains(c)
            case SchemaDetector.LatLon(a, o) =>
              cols.contains(a) && cols.contains(o)
          })
        case Left(_) => true
      }
    }

  property("month round-trips YYYY-MM filenames; taxi type detected") =
    forAll(Gen.choose(1990, 2030), Gen.choose(1, 12),
      Gen.oneOf("yellow", "green", "fhv")) { (y, m, t) =>
      val path = f"/data/${t}_tripdata_$y-$m%02d.parquet"
      PathMeta.monthFromPath(path).contains((y, m)) &&
        PathMeta.taxiType(path) == t
    }

  property("hive-style year=/month= wins over earlier YYYY-MM noise") =
    forAll(Gen.choose(1990, 2030), Gen.choose(1, 12)) { (y, m) =>
      val path = s"/archive-1999-12/year=$y/month=$m/part-0.parquet"
      PathMeta.monthFromPath(path).contains((y, m))
    }

  property("size parser round-trips KiB multiples") =
    forAll(Gen.choose(1L, 4096L), Gen.oneOf("K", "M", "G")) { (n, u) =>
      val mult = u match {
        case "K" => 1024L
        case "M" => 1024L * 1024
        case "G" => 1024L * 1024 * 1024
      }
      SizeParser.parse(s"$n$u").contains(n * mult) &&
        SizeParser.parse(s"$n${u}B").contains(n * mult)
    }

  property("hour pivot column list is exactly hour_0..hour_23") = Prop {
    graft.ops.HourPivot.hourCols == (0 until 24).map(h => s"hour_$h")
  }

  property("sampling hex thresholds are monotone in rate (nested samples)") =
    forAll(Gen.choose(1, 10000), Gen.choose(1, 10000)) { (a, b) =>
      val (lo, hi) = (math.min(a, b) / 10000.0, math.max(a, b) / 10000.0)
      // lexicographic hex-string order == numeric order for fixed width,
      // so a lower rate's selection is always a subset of a higher one's
      graft.ops.Sampling.hexThreshold(lo) <= graft.ops.Sampling.hexThreshold(hi)
    }

  property("lloyd k-means: k centroids, deterministic, within sample bounds") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(2, 6), Gen.choose(10, 40)) {
      (seed, k, n) =>
        val rnd = new scala.util.Random(seed)
        val sample = Array.fill(n)(Array.fill(4)(rnd.nextFloat() * 2 - 1))
        val c1 = graft.sim.Similarity.lloyd(sample, k, seed = 7L)
        val c2 = graft.sim.Similarity.lloyd(sample, k, seed = 7L)
        val bounds = (0 until 4).map { d =>
          (sample.map(_(d)).min, sample.map(_(d)).max)
        }
        c1.length == k &&
          c1.zip(c2).forall { case (x, y) => x.sameElements(y) } &&
          c1.forall(c => c.indices.forall { d =>
            c(d) >= bounds(d)._1 - 1e-4f && c(d) <= bounds(d)._2 + 1e-4f
          })
    }

  property("auto nProbe: probes everything below the density floor, base above") =
    forAll(Gen.choose(1L, 10000000L), Gen.choose(2, 64), Gen.choose(1, 64)) {
      (n, cells, base) =>
        val got = graft.sim.Similarity.autoNProbe(n, cells, base)
        if (n / cells < 64L) got == cells else got == base
    }

  property("ivfpq probe: auto-nProbe ranking is complete below the density floor, " +
    "top-ranked and deduplicated above") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(2, 16), Gen.choose(1, 8),
      Gen.choose(1L, 100000L), Gen.choose(2, 8)) { (seed, k, base, n, dim) =>
      val rnd = new scala.util.Random(seed)
      val cells = graft.sim.KMeans.Centroids(
        0 until k,
        Seq.fill(k)(Array.fill(dim)(rnd.nextInt(20001) - 10000L)))
      val query = Array.fill(dim)(rnd.nextInt(20001) - 10000L)
      val nProbe = graft.sim.Similarity.autoNProbe(n, k, base)
      val probed = graft.sim.ProductQuantizer.rankProbeCellsQ(
        cells, query, nProbe)
      def d2(c: Array[Long]): Long =
        c.zip(query).map { case (x, q) => val d = q - x; d * d }.sum
      val byDist = cells.ids.zip(cells.cells)
        .map { case (id, c) => (d2(c), id) }.sorted
      if (n / k < 64L)
        // thin corpus: the density floor must force ALL cells probed
        probed.sorted == (0 until k)
      else
        // dense: exactly the base nearest cells, smallest-id ties
        probed == byDist.take(base).map(_._2)
    }

  property("adc lut: zero at own centroid, non-negative, triangle-free exactness") =
    forAll(Gen.choose(1L, 1000000L), Gen.choose(2, 4), Gen.choose(2, 5),
      Gen.choose(2, 4)) { (seed, m, k, subDim) =>
      val rnd = new scala.util.Random(seed)
      val books = Seq.fill(m)(graft.sim.KMeans.Centroids(
        0 until k,
        Seq.fill(k)(Array.fill(subDim)(rnd.nextInt(2001) - 1000L))))
      val model = graft.sim.ProductQuantizer.PqModel(m, subDim, k, books)
      // query assembled FROM chosen centroids → lut is 0 exactly there
      val chosen = Array.fill(m)(rnd.nextInt(k))
      val query = (0 until m).flatMap(j => books(j).cells(chosen(j))).toArray
      val lut = graft.sim.ProductQuantizer.adcLut(query, model)
      lut.zipWithIndex.forall { case (row, j) =>
        row(chosen(j)) == 0L && row.forall(_ >= 0L) &&
          // exactness: hand-recompute one entry
          row(0) == books(j).cells(0).zip(
            query.slice(j * subDim, (j + 1) * subDim))
            .map { case (c, q) => val d = q - c; d * d }.sum
      }
    }
}

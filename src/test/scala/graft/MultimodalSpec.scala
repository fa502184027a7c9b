package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Session.builder("mm-test", "4").getOrCreate()
  import spark.implicits._

  private def fakeMedia(n: Int): Seq[MediaRow] =
    (0 until n).map { i =>
      val payload = Array.tabulate[Byte](256 + i)(j => ((i * 31 + j) % 127).toByte)
      MediaRow(i.toLong, payload,
        MediaMeta("image", 640, 480, 0, 0L))
    }

  test("feature extraction: deterministic, right shape, batched") {
    val ds = spark.createDataset(fakeMedia(10)).repartition(3)
    val feats = Multimodal.extractFeatures(ds, dim = 16, batchSize = 4).collect()
    assert(feats.length == 10)
    assert(feats.forall(_.features.length == 16))
    // determinism: run twice → identical
    val again = Multimodal.extractFeatures(ds, dim = 16, batchSize = 4).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ==
           again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
    // features reflect payload content: different ids differ
    assert(feats.map(_.features.toSeq).distinct.length > 1)
  }

  test("resize updates metadata and shrinks payload budget") {
    val ds = spark.createDataset(fakeMedia(4))
    val out = Multimodal.resize(ds, 320, 240).collect()
    assert(out.forall(r => r.meta.width == 320 && r.meta.height == 240))
    assert(out.forall(r => r.payload.length <= 256 + 4))
  }

  test("frame sampling fans out one row per offset") {
    val media = Seq(MediaRow(7L, Array[Byte](1, 2, 3),
      MediaMeta("video", 1920, 1080, 0, 5000L)))
    val ds = spark.createDataset(media)
    val frames = Multimodal.sampleFrames(ds, everyMs = 1000L).collect()
    assert(frames.length == 5)
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("DataFrame-level entry round-trips schema") {
    val df = spark.createDataset(fakeMedia(3)).toDF()
      .selectExpr("media_id", "payload", "meta.kind AS kind",
        "meta.width AS width", "meta.height AS height",
        "meta.sampleRate AS sampleRate", "meta.durationMs AS durationMs")
    val feats = Multimodal.featuresTable(df, dim = 8)
    assert(feats.columns.toSeq ==
      Seq("media_id", "kind", "features", "n_bytes"))
    assert(feats.count() == 3)
  }
}

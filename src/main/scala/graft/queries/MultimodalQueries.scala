package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal query surface. The container has no media files or
  * codecs, so the declared query manufactures a deterministic media
  * table from `documents` (payload = text bytes, metadata derived from
  * doc fields) and drives the REAL multimodal plumbing end-to-end:
  * typed encoder round-trip, batched `mapPartitions` feature
  * extraction, and the frame-sampling flatMap fan-out.
  *
  * The oracle covers everything deterministic across engines: ids,
  * kind routing, payload byte counts, feature dimensionality, frame
  * counts (pure metadata arithmetic), and a tolerance boolean asserting
  * the stub features are L1-normalized (they histogram payload bytes /
  * length, so components must sum to ~1) — the same accuracy-contract
  * pattern as q_approx_distinct. The feature VALUES are the stub
  * decoder's hash-fold, intentionally not declared.
  */
object MultimodalQueries {

  private val qFeatures = QueryDef(
    "q_multimodal_features",
    (s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        (pmod(col("n_chars"), lit(64)) * 10 + 10).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) * 10 + 10).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("long").as("durationMs"))
      val feats = Multimodal.featuresTable(media, dim = 64)
      val frames = Multimodal
        .framesTable(media, everyMs = 1000L)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
      feats
        .join(frames, Seq("media_id"))
        .select(
          col("media_id"), col("kind"), col("n_bytes"),
          size(col("features")).as("feat_dim"),
          col("n_frames"),
          (abs(aggregate(col("features"), lit(0.0d), (a, x) => a + x)
            - 1.0d) < 0.001d).as("features_normalized"))
    },
    Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS kind,
        CAST(strlen(text) AS INT) AS n_bytes,
        CAST(64 AS INT) AS feat_dim,
        CAST(CEIL(GREATEST(1, n_chars * 10) / 1000.0) AS BIGINT) AS n_frames,
        TRUE AS features_normalized
      FROM documents"""))

  def all: Seq[QueryDef] = Seq(qFeatures)
}

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

  /** Media similarity, ORACLE-EXACT end to end: payloads → batched
    * mapPartitions feature extraction (PortableMd5Decoder: feature i =
    * md5 hex digit i / 16 — a dyadic rational, exact in float32, so
    * any engine reproduces the vectors AND the quantized cosine
    * bit-for-bit) → brute-force top-20 neighbours of media 0. This
    * upgrades the multimodal family from contract checks to a full
    * hash check through the decoder seam; a real codec swaps in at the
    * same injection point with the identical plan shape.
    */
  private val qMediaAnn = QueryDef(
    "q_media_ann_topk",
    (s, d) => {
      val media = Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("image").as("kind"),
        lit(640).as("width"), lit(480).as("height"),
        lit(0).as("sampleRate"), lit(0L).as("durationMs"))
      val feats = Multimodal.featuresTable(media, dim = 32,
        decoder = Multimodal.PortableMd5Decoder)
      graft.functions.VectorFunctions.register(s)
      graft.sim.Similarity.topKByQueryId(feats, "media_id", "features",
        queryId = 0L, k = 20,
        scoreFn = graft.functions.VectorFunctions.q_vec_cosine)
    },
    Some("""
      WITH vec AS (
        SELECT doc_id AS media_id,
          list_transform(range(1, 33),
            i -> CAST(strpos('0123456789abcdef', substr(md5(text), i, 1)) - 1
              AS DOUBLE) / 16.0) AS v
        FROM documents),
      flat AS (
        SELECT media_id, CAST(ROUND(unnest(v) * 10000) AS BIGINT) AS qv,
          generate_subscripts(v, 1) AS i
        FROM vec),
      qf AS (SELECT i, qv AS qqv FROM flat WHERE media_id = 0),
      dots AS (
        SELECT f.media_id, SUM(f.qv * q.qqv) AS qdot, SUM(f.qv * f.qv) AS nrm
        FROM flat f JOIN qf q USING (i)
        GROUP BY f.media_id),
      qn AS (SELECT SUM(qqv * qqv) AS nrm0 FROM qf)
      SELECT media_id,
        CAST(qdot AS BIGINT) /
          (sqrt(CAST(nrm AS BIGINT)) * sqrt(CAST(nrm0 AS BIGINT))) AS score
      FROM dots, qn
      WHERE media_id <> 0
      ORDER BY score DESC, media_id
      LIMIT 20"""))

  /** The RESIZE transform declared through the gate (the one media
    * transform the other two exhibits don't exercise): every payload
    * re-scaled to a 64×48 byte budget via the batched partition-local
    * path — out = min(max(1, len·(64·48)/(w·h)), len), integer floor
    * arithmetic the oracle replays from (n_chars-derived) metadata.
    * Payloads never shuffle: resize is map-side; only (id, kind,
    * lengths) leave the scan stage.
    */
  private val qResize = QueryDef(
    "q_media_resize_budget",
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
      Multimodal.resize(Multimodal.mediaTable(media), w = 64, h = 48).toDF()
        .select(col("media_id"), col("meta.kind").as("kind"),
          length(col("payload")).cast("long").as("n_bytes_resized"),
          col("meta.width").cast("int").as("width"),
          col("meta.height").cast("int").as("height"))
    },
    Some("""
      SELECT doc_id AS media_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image'
             WHEN doc_id % 3 = 1 THEN 'audio'
             ELSE 'video' END AS kind,
        CAST(LEAST(GREATEST(1,
          strlen(text) * (64 * 48) //
            ((n_chars % 64 * 10 + 10) * (n_chars % 48 * 10 + 10))),
          strlen(text)) AS BIGINT) AS n_bytes_resized,
        CAST(64 AS INT) AS width,
        CAST(48 AS INT) AS height
      FROM documents"""))

  def all: Seq[QueryDef] = Seq(qFeatures, qMediaAnn, qResize)
}

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media ride through the engine as opaque BINARY columns
  * with a typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as partition-local batched transforms.
  *
  * The Spark-side mechanics here are real and tested — schema, encoder
  * round-trip, `mapPartitions` batch shape, partition sizing — but the
  * actual codec calls are STUBBED behind `MediaDecoder`: this container
  * has no image/audio libraries, so `StubDecoder` derives deterministic
  * fake outputs from the payload bytes. Swapping in a real decoder
  * (JavaCV, TwelveMonkeys, a JNI codec) changes ONE injection point and
  * nothing in the plan shape.
  *
  * Why mapPartitions and not an expression: codecs are heavyweight,
  * stateful, and want batch amortization (decoder init per PARTITION,
  * not per row) — the documented escape hatch (d) in the operator
  * preference order. Batches inside a partition bound peak memory:
  * `batchSize` rows are materialized at a time, the iterator stays lazy
  * between batches.
  *
  * 100 TB notes: payloads never shuffle in these transforms — they are
  * map-side only; partition count follows the scan
  * (`spark.sql.files.maxPartitionBytes`), and feature outputs (small
  * arrays) are what downstream shuffles touch.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
      features: Array[Float], n_bytes: Int)
  final case class FrameRow(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Decoder seam. Implementations must be deterministic per payload. */
  trait MediaDecoder extends Serializable {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float]
    def resize(payload: Array[Byte], meta: MediaMeta, w: Int, h: Int): Array[Byte]
    def frameOffsets(meta: MediaMeta, everyMs: Long): Seq[Long]

    /** 64-bit perceptual hash for near-duplicate detection. The
      * default dHashes the RAW payload byte stream (the decoded signal
      * this container can produce); a real codec implementation should
      * decode first and dHash the pixel/sample grid — same downstream
      * banding either way.
      */
    def perceptualHash(payload: Array[Byte], meta: MediaMeta): Long =
      byteDhash64(payload)
  }

  /** 1-D dHash over a byte stream — a REAL perceptual hash, not a
    * content digest: downsample the stream into 65 bucket means
    * (bucket of byte j = j·65 div n — the integer "resize to 65
    * pixels"; empty buckets, possible when n < 65, mean 0), then
    * bit i = [mean(i+1) > mean(i)]. Near-identical payloads move a
    * few bucket means slightly → a few bit flips → small Hamming
    * distance; md5-style digests scatter to ~32 bits for any change.
    * Every step is integer arithmetic on unsigned byte values, so any
    * engine replays the hash exactly.
    */
  def byteDhash64(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val sums = new Array[Long](65)
    val counts = new Array[Long](65)
    var j = 0
    while (j < n) {
      val b = (j.toLong * 65L / n).toInt
      sums(b) += (payload(j) & 0xff)
      counts(b) += 1
      j += 1
    }
    val m = Array.tabulate(65)(i => if (counts(i) == 0) 0L else sums(i) / counts(i))
    var h = 0L
    var i = 0
    while (i < 64) {
      if (m(i + 1) > m(i)) h |= (1L << i)
      i += 1
    }
    h
  }

  /** STUB: no codecs in this environment. Features are a deterministic
    * hash-fold of the payload (NOT real embeddings); resize re-scales
    * the byte budget; frame offsets are arithmetic on metadata. Replace
    * with a real codec-backed implementation in production.
    */
  object StubDecoder extends MediaDecoder {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = h ^ ((h << 5) + payload(i) + (h >> 2))
        out(math.abs((h % dim).toInt)) += 1.0f
        i += 1
      }
      val n = math.max(1, payload.length)
      out.map(_ / n)
    }

    def resize(payload: Array[Byte], meta: MediaMeta, w: Int, h: Int): Array[Byte] = {
      val srcPixels = math.max(1L, meta.width.toLong * meta.height)
      val outLen = math.max(1L,
        payload.length.toLong * (w.toLong * h) / srcPixels)
        .min(payload.length.toLong).toInt
      java.util.Arrays.copyOf(payload, outLen)
    }

    def frameOffsets(meta: MediaMeta, everyMs: Long): Seq[Long] =
      0L.until(math.max(1L, meta.durationMs)).by(math.max(1L, everyMs))
  }

  /** PORTABLE stub: features derived from the md5 of the payload —
    * feature i = (value of hex digit i) / 16, dim ≤ 32. Still fake
    * embeddings, but exactly reproducible by ANY engine with md5()
    * (digit/16 is a dyadic rational → exact in float32, so even
    * quantized cosine scores match SQL bit-for-bit). This is what lets
    * a media-similarity query be ORACLE-HASH-checked end to end
    * (q_media_ann_topk) instead of contract-checked; resize and frame
    * arithmetic are the same deterministic stubs.
    */
  object PortableMd5Decoder extends MediaDecoder {
    def features(payload: Array[Byte], meta: MediaMeta, dim: Int): Array[Float] = {
      require(dim <= 32, "md5 provides 32 hex digits")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(payload).map("%02x".format(_)).mkString
      Array.tabulate(dim)(i =>
        Character.digit(hex.charAt(i), 16).toFloat / 16.0f)
    }
    def resize(payload: Array[Byte], meta: MediaMeta, w: Int, h: Int): Array[Byte] =
      StubDecoder.resize(payload, meta, w, h)
    def frameOffsets(meta: MediaMeta, everyMs: Long): Seq[Long] =
      StubDecoder.frameOffsets(meta, everyMs)
  }

  /** Decode → feature-extract, batched within each partition. The
    * decoder is initialized once per partition (the expensive part with
    * a real codec), rows flow through in `batchSize` chunks.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64,
      batchSize: Int = 32,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          MediaFeatures(r.media_id, r.meta.kind,
            decoder.features(r.payload, r.meta, dim), r.payload.length)
        }
      }
    }
  }

  /** Resize transform — same batched partition-local shape. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int,
      batchSize: Int = 32,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          r.copy(payload = decoder.resize(r.payload, r.meta, w, h),
            meta = r.meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Frame sampling: one output row per sampled frame offset — the
    * fan-out shape (flatMap) a video pipeline needs. Payload slicing is
    * stubbed proportionally to the offset.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
      decoder: MediaDecoder = StubDecoder): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.flatMap { r =>
      decoder.frameOffsets(r.meta, everyMs).zipWithIndex.map {
        case (_, idx) => FrameRow(r.media_id, idx, r.payload)
      }
    }
  }

  final case class PHashRow(media_id: Long, phash: Long)

  /** Payloads → 64-bit perceptual hashes, batched partition-local
    * (the same decoder-seam shape as extractFeatures). Payload bytes
    * never leave the map stage — only (id, long) flows downstream.
    */
  def perceptualHashTable(media: Dataset[MediaRow], batchSize: Int = 32,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    implicit val enc = Encoders.product[PHashRow]
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(r =>
          PHashRow(r.media_id, decoder.perceptualHash(r.payload, r.meta)))
      }
    }.toDF()
  }

  /** Media near-duplicate pairs: perceptual hash behind the codec
    * seam, then graft.text.Dedup's Hamming-band machinery — `chunks`
    * exact-match bands propose candidates (pigeonhole: chunks >
    * maxHamming ⇒ recall exactly 1), bit_count(xor) verifies. Output
    * (id_a, id_b, hamming), id_a < id_b.
    *
    * 100 TB shape: the only payload-touching stage is the map-side
    * hash; every exchange after it carries (id, 64-bit hash, 16-bit
    * chunk) longs. Candidate volume per band bucket ≈ N/2^(64/chunks)
    * — grow chunk width with corpus size exactly like the text
    * simhash sizing rule.
    */
  def nearDupPairs(df: DataFrame, maxHamming: Int = 3, chunks: Int = 4,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    graft.text.Dedup.hammingNearDups(
      perceptualHashTable(mediaTable(df), decoder = decoder),
      "media_id", "phash", maxHamming, chunks)

  /** DataFrame → typed media rows (the schema-first boundary: callers
    * hand over flat columns, the typed path stays internal).
    */
  def mediaTable(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(
      col("media_id").cast("long"),
      col("payload").cast("binary"),
      struct(
        col("kind").cast("string").as("kind"),
        col("width").cast("int").as("width"),
        col("height").cast("int").as("height"),
        col("sampleRate").cast("int").as("sampleRate"),
        col("durationMs").cast("long").as("durationMs")).as("meta"))
      .as[MediaRow]
  }

  /** DataFrame-level entry: bytes + meta columns → features table. */
  def featuresTable(df: DataFrame, dim: Int = 64,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    extractFeatures(mediaTable(df), dim, decoder = decoder).toDF()

  /** DataFrame-level entry: bytes + meta columns → sampled frames. */
  def framesTable(df: DataFrame, everyMs: Long): DataFrame =
    sampleFrames(mediaTable(df), everyMs).toDF()
}

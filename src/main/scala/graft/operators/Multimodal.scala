package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `BINARY` columns with
  * typed metadata, plus batch decode / feature-extract / frame-sample
  * operators. The container has no image/audio codecs, so the decode
  * kernel is an explicitly-marked deterministic STUB — the Spark-side
  * contract (schema, binary transport, per-partition batch shape,
  * feature-vector output) is real and tested, and swapping the stub for
  * a JNI/codec call changes nothing upstream.
  *
  * Scale posture: binaries stay columnar in parquet; metadata predicates
  * (mime, size) push down without touching bytes; decode runs
  * per-partition with no shuffle; frame sampling is a narrow explode.
  */
object Multimodal {

  /** Synthesized media table over documents: (doc_id, media BINARY,
    * mime, width, height) — deterministic so the oracle can reproduce
    * the metadata exactly. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (col("doc_id") % 3 + 1).cast("int")).as("mime"),
      (lit(64) + (col("doc_id") % 8) * 16).cast("long").as("width"),
      (lit(64) + (col("doc_id") % 5) * 16).cast("long").as("height"))

  /** Metadata projection — never touches the bytes; with a parquet
    * media table this prunes to the metadata columns only. */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).select(
      col("doc_id"), col("mime"),
      length(col("media")).cast("long").as("n_bytes"),
      col("width"), col("height"))
      .orderBy("doc_id")

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
      features: Array[Float])

  /** STUB decode kernel: stands in for a real image/audio decode (codec
    * libraries are not available in this container). Deterministic fake
    * features from the byte stream; replace the body with a real decoder
    * without touching the operator plumbing. */
  private[operators] def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real codec call would go here (e.g. decode + pooled embedding)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(a => (a % 1000L) / 1000.0f)
  }

  /** Batch feature extraction over media binaries: `mapPartitions` so a
    * real decoder could amortize per-partition init (model load, codec
    * context) across its whole batch — the Scala analog of a Pandas-UDF
    * batch. Narrow; no shuffle. */
  def extractFeatures(spark: SparkSession, sfDir: String, dim: Int = 4): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("media"), col("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would happen here (codec/model handle)
        rows.map(r => MediaFeatures(r.doc_id, r.mime, r.media.length.toLong,
          stubDecode(r.media, dim)))
      }
  }

  /** Resize planning: aspect-preserving fit of every media item into a
    * target box, all in exact integer math (floor((dim·target)/max-dim))
    * so the oracle reproduces it bit-for-bit. The pixel work itself would
    * ride the same mapPartitions contract as [[extractFeatures]]; the
    * plan — dims in, dims + output buffer size out, no shuffle — is the
    * real operator surface. */
  def resizeMeta(spark: SparkSession, sfDir: String, target: Int = 128): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        greatest(col("width"), col("height")).as("m"))
      .select(col("doc_id"), col("mime"), col("width"), col("height"),
        (col("width") * target / col("m")).cast("long").as("out_w"),
        (col("height") * target / col("m")).cast("long").as("out_h"))
      .withColumn("out_bytes", (col("out_w") * col("out_h") * 3).cast("long"))
      .orderBy("doc_id")

  val PhashBits = 60
  val PhashBandBits = 15
  val PhashBands = 4
  val PhashBucketCap = 200
  val PhashMaxHamming = 6

  /** Perceptual average-hash (aHash-style) dedup over the media BINARY
    * column — the modality-specific near-dup pass an image corpus runs
    * (dHash/aHash over decoded pixels): bytes fold into `PhashBits`
    * positional buckets, each bucket's mean is compared to the global
    * mean, and the resulting 60-bit signature is deduped with the same
    * banded-LSH hamming machinery as [[Dedup.simhashPairs]]. With a real
    * decoder the bucket sums would come from pixel blocks; the bucketing,
    * signature, banding and verification are the actual operator.
    *
    * Integer-exact end to end: the mean comparison is the cross-multiply
    * `s·tc > ts·c` (no FP division), so the oracle reproduces every bit.
    * Safe in int64 for media up to ~4·10⁷ bytes. One char-scale shuffle
    * (bucket sums), then everything is signature-sized. */
  def phashPairs(spark: SparkSession, sfDir: String,
      maxHamming: Int = PhashMaxHamming): DataFrame = {
    // native one-pass signature kernel ([[graft.plans.AvgHash]]): the
    // previous pipeline exploded every character into a corpus-chars
    // shuffle (groupBy bucket) + per-doc window + re-aggregate — two
    // exchanges of ~len rows per doc; the kernel computes the identical
    // integer bucket sums and cross-multiply mean test in a projection
    // (4.9 s → sub-second at sf0.1)
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val sig = mediaTable(spark, sfDir)
      .select(col("doc_id"), column(graft.plans.AvgHash(
        expression(decode(col("media"), "UTF-8")), PhashBits)).as("sig"))
      .filter(col("sig").isNotNull) // empty blobs: oracle drops them too
    Dedup.bandedHammingPairs(sig, PhashBandBits, PhashBands,
      PhashBucketCap, maxHamming)
  }

  /** DuckDB twin of [[phashPairs]]. */
  def phashOracle: String =
    s"""WITH m AS (SELECT doc_id, text AS t FROM documents),
       |e0 AS (SELECT doc_id, t, unnest(generate_series(1, length(t))) AS i FROM m),
       |ex AS (SELECT doc_id, (i - 1) % $PhashBits AS b,
       |              ascii(substring(t, i, 1)) AS v FROM e0),
       |bu AS (SELECT doc_id, b, sum(v) AS s, count(*) AS c FROM ex GROUP BY 1, 2),
       |tt AS (SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM bu GROUP BY 1),
       |sig AS (SELECT bu.doc_id,
       |               CAST(sum(CASE WHEN bu.s * tt.tc > tt.ts * bu.c
       |                             THEN (CAST(1 AS BIGINT) << CAST(bu.b AS INT))
       |                             ELSE 0 END) AS BIGINT) AS sig
       |        FROM bu JOIN tt USING (doc_id) GROUP BY bu.doc_id),
       |bands AS (SELECT doc_id, sig, band,
       |                 (sig >> (band * $PhashBandBits)) & ${(1L << PhashBandBits) - 1} AS key
       |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS band) g),
       |ok AS (SELECT band, key FROM bands GROUP BY band, key
       |       HAVING count(*) <= $PhashBucketCap),
       |bk AS (SELECT b.* FROM bands b JOIN ok USING (band, key)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.sig AS sa, b.doc_id AS doc_b, b.sig AS sb
       |         FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
       |                            AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $PhashMaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Frame sampling: n evenly-spaced byte-range "frames" per media blob
    * (a real video op would seek keyframes; the slicing contract and the
    * exploded output shape are identical). */
  def frameSample(spark: SparkSession, sfDir: String, nFrames: Int = 4): DataFrame = {
    val m = mediaTable(spark, sfDir)
    val frameLen = (length(col("media")) / nFrames).cast("int")
    m.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(nFrames - 1)), i =>
          substring(col("media"), (i * frameLen + 1).cast("int"), greatest(frameLen, lit(1))))) // 1-based
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"))
      .orderBy("doc_id", "frame_idx")
  }
}

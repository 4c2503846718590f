package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: media as opaque `BINARY` columns with
  * typed metadata, plus batch decode / feature-extract / frame-sample
  * operators. All three modalities run REAL JDK codecs, no extra
  * dependency: PNG via `javax.imageio` (images), WAV PCM via
  * `javax.sound.sampled` (audio), multi-frame animated GIF via the
  * `javax.imageio` sequence reader/writer (the video stand-in — the JDK
  * has no mp4 codec, GIF is its one multi-frame container). Each codec
  * is lossless for the synthesized content, and the content follows a
  * closed formula, so the DuckDB oracle replays every decode→feature
  * pipeline arithmetically — checking genuine codec round-trips
  * bit-for-bit.
  *
  * Scale posture: binaries stay columnar in parquet; metadata predicates
  * (mime, size) push down without touching bytes; decode runs
  * per-partition, and media BYTES never cross a shuffle (the synthetic
  * pipelines shuffle only metadata-sized rows to spread codec CPU);
  * frame sampling is a narrow explode.
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

  case class PngRow(doc_id: Long, media: Array[Byte])
  case class CellSums(doc_id: Long, cell: Long,
      rs: Long, gs: Long, bs: Long, cnt: Long)

  /** Deterministic pixel formula: channel `c` (0=R 1=G 2=B) of pixel
    * (x, y) in doc `d`. Shared by the PNG synthesizer below and replayed
    * arithmetically by the DuckDB oracle — PNG is lossless, so
    * decode(encode(pixels)) must reproduce exactly these values. */
  private[operators] def pixelChannel(d: Long, x: Int, y: Int, c: Int): Int =
    ((c match {
      case 0 => d * 7 + x * 3L + y * 5L
      case 1 => d * 11 + x + y * 2L
      case _ => d * 13 + x * 2L + y
    }) % 256).toInt

  /** Real PNG media: every `image/png` row of the media table becomes an
    * actual PNG file — `javax.imageio` encode on the executors, pixel
    * values from [[pixelChannel]], dims from the metadata columns. The
    * mime predicate prunes at the metadata level BEFORE any pixel work.
    * At 100 TB this is the classic decode stage: byte blobs in, byte
    * blobs out, bytes never shuffled (only the tiny metadata rows move,
    * see below), codec init amortized per partition. */
  /** `javax.imageio` streams over in-memory bytes default to a
    * DISK-backed cache (`FileCacheImage{In,Out}putStream`): one temp file
    * + file descriptor per stream — per DOCUMENT in these codec stages —
    * and the fd lives until the stream is closed or GC'd. At sf10 (≈60×
    * the gate's doc count) the churn outruns GC and the executor JVM dies
    * with "Too many open files" (caught by the round-7 scale probe; at
    * 100 TB it would also be pointless disk I/O on every row). Media here
    * is always a small in-memory byte[], so use the memory cache: zero
    * files, zero fds. JVM-wide flag; idempotent, called at the head of
    * every codec closure (≈ once per executor). */
  private[operators] def memoryCachedImageIO(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  def pngMedia(spark: SparkSession, sfDir: String): Dataset[PngRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("mime") === "image/png")
      .select(col("doc_id"), col("width").cast("int").as("w"),
        col("height").cast("int").as("h"))
      // the synthesis input is metadata-sized (a few small parquet
      // partitions) but the codec work is CPU-bound: spread it across
      // every core — shuffling (id, w, h) rows costs nothing. A real
      // media lake already stores blobs across many files and would
      // skip this.
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, Int, Int)]
      .mapPartitions { rows =>
        memoryCachedImageIO()
        rows.map { case (d, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // bulk row-major pixel write (per-pixel setRGB pays a color
          // model conversion per call — 3-4× the whole encode cost)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) =
                (pixelChannel(d, x, y, 0) << 16) |
                (pixelChannel(d, x, y, 1) << 8) |
                pixelChannel(d, x, y, 2)
              x += 1
            }
            y += 1
          }
          img.setRGB(0, 0, w, h, px, 0, w)
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          PngRow(d, bos.toByteArray)
        }
      }
  }

  /** Batch feature extraction with a REAL decoder: `javax.imageio` PNG
    * decode per partition, then `grid`×`grid` mean-RGB pooling in exact
    * integer sums (the division + rounding happens once, in the plan, so
    * the oracle's `round(sum/count, 6)` is the identical IEEE op).
    * Output: (doc_id, cell, r, g, b) — one pooled feature row per grid
    * cell. mapPartitions so a heavier codec/model would amortize its
    * init across the batch — the Scala analog of a Pandas-UDF batch;
    * narrow, no shuffle, only cell-level rows leave the decode stage. */
  def extractFeatures(spark: SparkSession, sfDir: String, grid: Int = 2): DataFrame = {
    import spark.implicits._
    val pooled = pngMedia(spark, sfDir).mapPartitions { rows =>
      memoryCachedImageIO()
      rows.flatMap { p =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(p.media))
        val w = img.getWidth
        val h = img.getHeight
        val n = grid * grid
        val rs = new Array[Long](n)
        val gs = new Array[Long](n)
        val bs = new Array[Long](n)
        val cnt = new Array[Long](n)
        // bulk row-major read (mirrors the encoder's bulk write)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cell = (y * grid / h) * grid + (x * grid / w)
            val rgb = px(y * w + x)
            rs(cell) += (rgb >> 16) & 0xff
            gs(cell) += (rgb >> 8) & 0xff
            bs(cell) += rgb & 0xff
            cnt(cell) += 1
            x += 1
          }
          y += 1
        }
        (0 until n).map(c =>
          CellSums(p.doc_id, c.toLong, rs(c), gs(c), bs(c), cnt(c)))
      }
    }
    pooled.toDF()
      .select(col("doc_id"), col("cell"),
        round(col("rs") / col("cnt"), 6).as("r"),
        round(col("gs") / col("cnt"), 6).as("g"),
        round(col("bs") / col("cnt"), 6).as("b"))
      .orderBy("doc_id", "cell")
  }

  /** DuckDB twin of [[extractFeatures]]: replays [[pixelChannel]] over
    * the same dims and pools the same grid — valid as an oracle for the
    * real codec path precisely because PNG is lossless. */
  def featuresOracle(grid: Int = 2): String =
    s"""WITH im AS (SELECT doc_id,
       |              64 + (doc_id % 8) * 16 AS w, 64 + (doc_id % 5) * 16 AS h
       |            FROM documents WHERE doc_id % 3 = 0),
       |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, CAST(w - 1 AS INT))) AS x FROM im),
       |px AS (SELECT doc_id, w, h, x, unnest(generate_series(0, CAST(h - 1 AS INT))) AS y FROM xs),
       |ch AS (SELECT doc_id,
       |              (y * $grid // h) * $grid + (x * $grid // w) AS cell,
       |              (doc_id * 7 + x * 3 + y * 5) % 256 AS r,
       |              (doc_id * 11 + x + y * 2) % 256 AS g,
       |              (doc_id * 13 + x * 2 + y) % 256 AS b
       |       FROM px)
       |SELECT doc_id, CAST(cell AS BIGINT) AS cell,
       |       round(sum(r) / count(*), 6) AS r,
       |       round(sum(g) / count(*), 6) AS g,
       |       round(sum(b) / count(*), 6) AS b
       |FROM ch GROUP BY doc_id, cell ORDER BY doc_id, cell""".stripMargin

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

  case class WavRow(doc_id: Long, media: Array[Byte])
  case class SegStats(doc_id: Long, seg: Long, n: Long, sumAbs: Long, maxAmp: Long)

  /** Deterministic 16-bit PCM sample `i` of doc `d` — the audio twin of
    * [[pixelChannel]], replayed arithmetically by the oracle (WAV PCM is
    * lossless). Range [-32768, 32767]. */
  private[operators] def sample16(d: Long, i: Int): Int =
    (((d * 31 + i * 17L) % 65536) - 32768).toInt

  /** Samples per audio doc: 0.5–1 s of 8 kHz mono. */
  private[operators] def nSamples(d: Long): Int = (4000 + (d % 5) * 1000).toInt

  /** Real WAV media: every `audio/wav` row becomes an actual RIFF/WAV
    * file via the JDK's `javax.sound.sampled` codec (8 kHz mono 16-bit
    * PCM little-endian), samples from [[sample16]]. Same shape as
    * [[pngMedia]]: metadata-pruned, repartitioned for codec CPU,
    * narrow. */
  def wavMedia(spark: SparkSession, sfDir: String): Dataset[WavRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("mime") === "audio/wav")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { ids =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        ids.map { d =>
          val n = nSamples(d)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = sample16(d, i)
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          WavRow(d, bos.toByteArray)
        }
      }
  }

  /** REAL audio decode + segment features: `AudioSystem` parses the WAV
    * container back to PCM on the executors, then 4 equal segments get
    * (count, mean |amplitude|, max |amplitude|) in exact integer sums —
    * the standard energy-profile features an audio curation pipeline
    * computes. Oracle replays [[sample16]] because PCM is lossless. */
  def audioFeatures(spark: SparkSession, sfDir: String, segments: Int = 4): DataFrame = {
    import spark.implicits._
    val pooled = wavMedia(spark, sfDir).mapPartitions { rows =>
      rows.flatMap { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.media))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected decoded format: $fmt")
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        val cnt = new Array[Long](segments)
        val sumAbs = new Array[Long](segments)
        val maxAmp = new Array[Long](segments)
        var i = 0
        while (i < n) {
          val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
          val seg = i * segments / n
          val a = math.abs(s)
          cnt(seg) += 1
          sumAbs(seg) += a
          if (a > maxAmp(seg)) maxAmp(seg) = a
          i += 1
        }
        (0 until segments).map(q =>
          SegStats(r.doc_id, q.toLong, cnt(q), sumAbs(q), maxAmp(q)))
      }
    }
    pooled.toDF()
      .select(col("doc_id"), col("seg"), col("n"),
        round(col("sumAbs") / col("n"), 6).as("mean_abs"),
        col("maxAmp").as("max_amp"))
      .orderBy("doc_id", "seg")
  }

  /** DuckDB twin of [[audioFeatures]] — replays [[sample16]] and the
    * segmentation; a valid oracle for the real codec path because WAV
    * PCM round-trips bit-for-bit. */
  def audioOracle(segments: Int = 4): String =
    s"""WITH au AS (SELECT doc_id, 4000 + (doc_id % 5) * 1000 AS ns
       |            FROM documents WHERE doc_id % 3 = 1),
       |ix AS (SELECT doc_id, ns, unnest(generate_series(0, CAST(ns - 1 AS INT))) AS i FROM au),
       |sm AS (SELECT doc_id, i * $segments // ns AS seg,
       |              abs(((doc_id * 31 + i * 17) % 65536) - 32768) AS a
       |       FROM ix)
       |SELECT doc_id, CAST(seg AS BIGINT) AS seg, count(*) AS n,
       |       round(sum(a) / count(*), 6) AS mean_abs,
       |       CAST(max(a) AS BIGINT) AS max_amp
       |FROM sm GROUP BY doc_id, seg ORDER BY doc_id, seg""".stripMargin

  case class GifRow(doc_id: Long, media: Array[Byte])
  case class FrameStats(doc_id: Long, frame_idx: Long,
      n_px: Long, graySum: Long, max_gray: Long)

  /** Deterministic gray value of pixel (x, y) in frame `f` of doc `d` —
    * the video twin of [[pixelChannel]]/[[sample16]], replayed
    * arithmetically by the oracle. GIF's 256-entry palette carries all
    * 256 gray levels, so the round-trip is lossless (asserted by
    * MultimodalSpec on every level). */
  private[operators] def frameGray(d: Long, f: Int, x: Int, y: Int): Int =
    ((d * 7 + f * 19 + x * 3L + y * 5L) % 256).toInt

  /** Per-doc frame geometry: (width, height, frameCount). Variable frame
    * counts exercise the container's frame directory for real — height
    * and frame count derive from `d / 3`, NOT `d % 3`, because
    * [[gifMedia]]'s mime filter only materializes `d % 3 == 2` docs and a
    * `% 3` component would be constant across the whole media set. */
  private[operators] def gifDims(d: Long): (Int, Int, Int) =
    ((32 + (d % 4) * 16).toInt, (32 + (d / 3 % 3) * 16).toInt, (2 + d / 3 % 3).toInt)

  /** Real multi-frame media: every `video/mp4`-slot row becomes an actual
    * ANIMATED GIF via the JDK's `javax.imageio` sequence writer — the
    * JDK has no mp4 codec, and GIF is its one multi-frame container, so
    * it stands in for the video modality while keeping the operator
    * surface real: a container whose frame directory must be parsed and
    * whose frames must be individually decoded. Same shape as
    * [[pngMedia]]: metadata-pruned before any pixel work, repartitioned
    * to spread codec CPU, bytes never shuffled. */
  def gifMedia(spark: SparkSession, sfDir: String): Dataset[GifRow] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .filter(col("mime") === "video/mp4")
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .mapPartitions { ids =>
        memoryCachedImageIO()
        ids.map { d =>
          val (w, h, nf) = gifDims(d)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          wr.setOutput(ios)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, frameGray(d, f, x, y))
                x += 1
              }
              y += 1
            }
            wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          wr.endWriteSequence()
          wr.dispose()
          ios.close()
          GifRow(d, bos.toByteArray)
        }
      }
  }

  /** REAL frame sampling: `javax.imageio`'s GIF reader parses the
    * container's frame directory (`getNumImages(true)` walks the actual
    * stream), decodes every frame, and emits per-frame luminance
    * features in exact integer sums — (n_px, mean_gray, max_gray). The
    * oracle replays [[frameGray]] because the GIF round-trip is
    * lossless. Narrow end-to-end: only frame-level feature rows leave
    * the decode stage. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stats = gifMedia(spark, sfDir).mapPartitions { rows =>
      memoryCachedImageIO()
      rows.flatMap { r =>
        val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.media))
        rd.setInput(iis)
        val nf = rd.getNumImages(true)
        val out = (0 until nf).map { f =>
          val img = rd.read(f)
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0L
          var mx = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = (img.getRGB(x, y) & 0xff).toLong
              sum += v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          FrameStats(r.doc_id, f.toLong, w.toLong * h, sum, mx)
        }
        rd.dispose()
        iis.close()
        out
      }
    }
    stats.toDF()
      .select(col("doc_id"), col("frame_idx"), col("n_px"),
        round(col("graySum") / col("n_px"), 6).as("mean_gray"),
        col("max_gray"))
      .orderBy("doc_id", "frame_idx")
  }
}

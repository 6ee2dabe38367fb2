package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * processed with `mapPartitions` in batch shape — the pattern a real
  * image/audio pipeline uses at 100 TB (binary column stays columnar in
  * parquet; decode runs per-partition with library handles reused across
  * rows; only extracted features shuffle, never raw bytes).
  *
  * Three decode tiers:
  *  - q_mm_decode_resize runs a REAL lossless codec end-to-end: every
  *    document's bytes are encoded into an actual grayscale PNG
  *    (java.awt BufferedImage + javax.imageio — pure JVM, headless),
  *    the binary column crosses a DataFrame boundary, and a second
  *    mapPartitions stage decodes it with ImageIO.read and resizes the
  *    decoded raster (nearest-neighbor 4×4). Grayscale PNG is lossless,
  *    so the oracle recomputes the identical pixels from the raw bytes
  *    in SQL.
  *  - q_mm_jpeg_decode runs a REAL lossy codec end-to-end: genuine JFIF
  *    bytes (ImageIO's JPEG plugin), decoded and compared against the
  *    source grid. The oracle checks what lossy decode leaves exact —
  *    dimensions and a bounded-MAE verdict; the spec pins the JPEG
  *    magic bytes and the empirical error envelope.
  *  - q_mm_wav_decode runs a REAL audio codec end-to-end: genuine
  *    RIFF/WAVE bytes (javax.sound.sampled — pure JVM, headless),
  *    container parsed, format inspected, PCM frames streamed back.
  *    8-bit PCM is lossless, so the oracle recomputes every published
  *    sample statistic from the raw bytes.
  *  - q_mm_gif_frames runs a REAL video-container codec end-to-end:
  *    genuine multi-frame animated GIFs (ImageIO's sequence writer over
  *    an explicit identity-gray palette — lossless by construction),
  *    container-parsed for the frame count, with ONLY the first/middle/
  *    last keyframes decoded (reader.read(index) never touches the
  *    other frames).
  *  - q_mm_features / q_mm_resize / q_mm_frame_sample run the SAME real
  *    codecs (the former stub tier is retired): features and resize
  *    decode genuine PNG bytes with ImageIO and publish statistics of
  *    the decoded raster; frame_sample parses genuine multi-frame GIF
  *    containers and decodes only the sampled keyframes. The one codec
  *    class the container genuinely lacks is a native video bitstream
  *    (H.264/MP4) — the GIF container tier is the honest maximum there.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  // ImageIO defaults to DISK-backed image streams (a temp file per
  // encode/decode) — for in-memory byte-array payloads that is pure
  // overhead, and on a 1000-executor cluster it adds local-disk churn
  // per row. Each codec mapPartitions flips to memory-cached streams
  // first (a static JVM setter, so once per executor in practice —
  // set inside the partition function because that is the only code
  // guaranteed to run on the executor JVM).
  private def noDiskCache(): Unit = javax.imageio.ImageIO.setUseCache(false)

  /** assets = documents' text bytes as opaque binary payloads (scales
    * with sf; no extra fixture needed). */
  private def assets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("application/octet-stream").as("mime"))

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", IntegerType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Deterministic image geometry shared by the encode stage and the
    * oracle: bytes fill a ≤64-wide grayscale grid row-major, zero-padded
    * in the last row; empty payloads become a 1×1 black pixel. */
  private def geom(n: Int): (Int, Int) = {
    val w = math.min(64, math.max(n, 1))
    (w, (math.max(n, 1) + w - 1) / w)
  }

  /** documents rendered as REAL grayscale PNGs (one per doc): the encode
    * half of the real-codec round trip. Runs at the same mapPartitions
    * batch boundary a production encoder would. */
  private def pngAssets(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val out = assets(s, dir).rdd.mapPartitions { it =>
      noDiskCache()
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val c = r.getAs[Array[Byte]]("content")
        val (w, h) = geom(c.length)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < c.length) {
          raster.setSample(i % w, i / w, 0, c(i) & 0xff)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, "image/png")
      }
    }
    s.createDataFrame(out, schema)
  }

  /** documents rendered as REAL JPEGs (one per doc) alongside their
    * source bytes — the lossy second codec tier. Same grid geometry as
    * the PNG path; ImageIO's JPEG plugin is pure-JVM and headless. */
  private[graft] def jpegAssets(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("src", BinaryType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val out = assets(s, dir).rdd.mapPartitions { it =>
      noDiskCache()
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val c = r.getAs[Array[Byte]]("content")
        val (w, h) = geom(c.length)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var i = 0
        while (i < c.length) {
          raster.setSample(i % w, i / w, 0, c(i) & 0xff)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        Row(id, c, bos.toByteArray, "image/jpeg")
      }
    }
    s.createDataFrame(out, schema)
  }

  /** MAE gate for the lossy tier: JPEG error on this text-byte imagery
    * is small (spec pins the empirical envelope); the query publishes a
    * generous bound as a boolean the oracle asserts TRUE — a broken
    * decode (shifted raster, wrong dims, garbage) trips it. */
  private[graft] val JpegMaeBound = 32.0

  /** hot-bucket cap for the perceptual-hash band join (the text-LSH
    * discipline: a degenerate band value — e.g. the all-dark band —
    * otherwise makes the bucket self-join quadratic) */
  private[graft] val ImgBucketCap = 32

  /** doc_id + the 8×8 perceptual average-hash of the decoded PNG,
    * kept as four 16-bit band values b0..b3 (band k holds sample bits
    * 16k..16k+15 in row-major (i,j) order; bit set ⇔ sample > mean,
    * mean = floor of the 64-sample sum / 64 — all integer-exact, so
    * the oracle recomputes the hash from the raw bytes in SQL). */
  private[graft] def imageAHash(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(
      StructField("doc_id", LongType, nullable = false) ::
        (0 until 4).map(b =>
          StructField(s"b$b", IntegerType, nullable = false)).toList)
    val out = pngAssets(s, dir).rdd.mapPartitions { it =>
      noDiskCache()
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val png = r.getAs[Array[Byte]]("content")
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        require(img != null, s"doc $id: undecodable image payload")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val samples = new Array[Int](64)
        var k = 0
        while (k < 64) {
          samples(k) = raster.getSample((k % 8) * w / 8, (k / 8) * h / 8, 0)
          k += 1
        }
        val mean = samples.foldLeft(0L)(_ + _) / 64
        val bands = new Array[Int](4)
        k = 0
        while (k < 64) {
          if (samples(k) > mean) bands(k / 16) |= 1 << (k % 16)
          k += 1
        }
        Row(id, bands(0), bands(1), bands(2), bands(3))
      }
    }
    s.createDataFrame(out, schema)
  }

  /** The WAVE file writer/reader, resolved ONCE per partition instead
    * of per row: `AudioSystem.write`/`getAudioInputStream` both funnel
    * every call through the JVM-GLOBAL synchronized provider registry
    * (sun JDK13Services.getProviders), so 32 executor threads × one
    * call per row convoy on a single lock — measured as the sf1 sweep's
    * only >10× scaler (q_mm_wav_decode ×20 at 10× rows). ServiceLoader
    * resolution outside the row loop keeps the identical javax.sound
    * codec doing the identical container work, minus the lock. */
  private def wavWriter(): javax.sound.sampled.spi.AudioFileWriter = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    while (it.hasNext) {
      val w = it.next()
      if (w.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
        return w
    }
    throw new IllegalStateException("no WAVE AudioFileWriter provider")
  }
  private def wavReader(): javax.sound.sampled.spi.AudioFileReader = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val probe = new java.io.ByteArrayInputStream(waveProbeBytes)
    while (it.hasNext) {
      val r = it.next()
      try {
        probe.reset()
        r.getAudioInputStream(probe).close()
        return r
      } catch { case _: Exception => () }
    }
    throw new IllegalStateException("no WAVE AudioFileReader provider")
  }
  /** a minimal valid 1-sample WAV used to pick the reader that actually
    * speaks the container */
  private lazy val waveProbeBytes: Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array[Byte](0)), fmt, 1L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** documents rendered as REAL WAV files (8-bit unsigned PCM mono,
    * 8 kHz) — the audio codec tier. javax.sound.sampled is pure-JVM and
    * headless like ImageIO; PCM is lossless, so decoded samples are the
    * source bytes exactly and the oracle recomputes every statistic.
    * Empty payloads become a single zero sample (the 1×1-pixel analog). */
  private[graft] def wavAssets(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val out = assets(s, dir).rdd.mapPartitions { it =>
      val writer = wavWriter() // once per partition, see wavWriter scaladoc
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val c0 = r.getAs[Array[Byte]]("content")
        val c = if (c0.isEmpty) Array[Byte](0) else c0
        val fmt = new javax.sound.sampled.AudioFormat(
          8000f, 8, 1, false /* 8-bit WAV PCM is unsigned */, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(c), fmt, c.length.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        writer.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Row(id, bos.toByteArray, "audio/wav")
      }
    }
    s.createDataFrame(out, schema)
  }

  /** GIF frame geometry: fixed 16×16 grayscale frames, 256 source bytes
    * per frame, zero-padded tail; empty payloads become one zero frame. */
  private[graft] val GifW = 16
  private[graft] val GifFrameBytes = GifW * GifW

  /** documents rendered as REAL multi-frame animated GIFs — the video
    * container tier. Each 256-byte slice of the payload becomes one
    * 16×16 frame; frames are written with ImageIO's sequence API (one
    * genuine GIF container per doc). The palette is an EXPLICIT
    * 256-entry identity-gray IndexColorModel, so encoding is lossless
    * by construction (GIF holds ≤256 colors; 256 grays fit exactly) and
    * the oracle can recompute every published pixel statistic from the
    * raw bytes. */
  private[graft] def gifAssets(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val out = assets(s, dir).rdd.mapPartitions { it =>
      noDiskCache()
      val cmap = Array.tabulate(256)(i => (0xff << 24) | (i << 16) | (i << 8) | i)
      val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val c = r.getAs[Array[Byte]]("content")
        val nFrames = math.max(1, (c.length + GifFrameBytes - 1) / GifFrameBytes)
        val bos = new java.io.ByteArrayOutputStream()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            GifW, GifW, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
          val raster = img.getRaster
          var i = 0
          while (i < GifFrameBytes) {
            val src = f * GifFrameBytes + i
            raster.setSample(i % GifW, i / GifW, 0,
              if (src < c.length) c(src) & 0xff else 0)
            i += 1
          }
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.close()
        writer.dispose()
        Row(id, bos.toByteArray, "image/gif")
      }
    }
    s.createDataFrame(out, schema)
  }

  /** MP4 media timescale: 8000 samples/s (matches the WAV tier) and
    * the mvhd presentation timescale (1000 = milliseconds, the
    * conventional value). */
  private[graft] val Mp4MediaTimescale = 8000
  private[graft] val Mp4MovieTimescale = 1000

  /** documents rendered as REAL MP4 (ISO base media file format)
    * containers — the VIDEO CONTAINER tier. The JVM sandbox has no
    * H.264 bitstream decoder (and shipping one is out of scope), but a
    * training-data pipeline's video handling starts one level below
    * the codec: parse the container, read timing/track/sample-table
    * metadata, and locate the payload — exactly what ffprobe does
    * before any decode. Each document becomes a spec-shaped BMFF tree
    * (ftyp + moov{mvhd, trak{tkhd, mdia{mdhd, hdlr, minf{smhd, dinf,
    * stbl{stsd/stts/stsc/stsz/stco}}}}} + mdat) holding the payload as
    * 1-byte 'twos' (raw PCM) samples at 8 kHz: every box size, the
    * durations in BOTH timescales, the sample count and the stco chunk
    * offset are real and internally consistent, so the probe must walk
    * genuine box grammar to answer. Empty payloads become one zero
    * sample (the WAV/GIF convention). */
  private[graft] def mp4Assets(s: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false),
      StructField("mime", StringType, nullable = false)))
    val out = assets(s, dir).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getAs[Long]("doc_id")
        val c0 = r.getAs[Array[Byte]]("content")
        val payload = if (c0.isEmpty) Array[Byte](0) else c0
        Row(id, Mp4.render(payload), "video/mp4")
      }
    }
    s.createDataFrame(out, schema)
  }

  val defs: Map[String, Q] = Map(
    // REAL JPEG decode — the second (lossy) codec tier next to the
    // lossless PNG round trip: genuine JFIF bytes cross the DataFrame
    // boundary, ImageIO decodes them, and the decoded raster is
    // compared against the source grid. Lossy pixels cannot hash-match
    // an oracle, so the oracle-checked surface is what IS exact:
    // decoded dimensions (pure functions of the byte count) and the
    // bounded mean-absolute-error verdict.
    "q_mm_jpeg_decode" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("src_bytes", IntegerType, nullable = false),
        StructField("mae_ok", BooleanType, nullable = false)))
      val out = jpegAssets(s, dir).rdd.mapPartitions { it =>
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val src = r.getAs[Array[Byte]]("src")
          val jpeg = r.getAs[Array[Byte]]("content")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
          require(img != null, s"doc $id: undecodable JPEG payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var absErr = 0L
          var i = 0
          while (i < w * h) {
            val want = if (i < src.length) src(i) & 0xff else 0
            absErr += math.abs(raster.getSample(i % w, i / w, 0) - want)
            i += 1
          }
          val mae = absErr.toDouble / (w * h)
          Row(id, w, h, src.length, mae <= JpegMaeBound)
        }
      }
      s.createDataFrame(out, schema)
    },

    // Image near-duplicate detection by perceptual hash — the IMAGE
    // tier of the dedup stack (text has MinHash-LSH, embeddings have
    // sign-LSH; scraped image corpora dedup on perceptual hashes the
    // same way). aHash over the REAL decoded PNG raster: nearest-
    // neighbor 8×8 downsample, mean threshold, 64 bits kept as FOUR
    // 16-bit band values (no 64-bit assembly — bit 63 would sign-
    // overflow differently across engines). The bands then run the
    // exact text-LSH discipline: band values ARE the LSH keys, hot
    // buckets capped at ImgBucketCap BEFORE the self-join (caps
    // mirrored in the oracle — capped semantics are the defined
    // semantics), candidates verify by banded hamming distance ≤ 8
    // computed from the 4×16-bit columns. At 100 TB: hashes are 4
    // ints per image (bytes never shuffle), the join key is the band
    // bucket, and every bucket is bounded by construction. The oracle
    // recomputes the identical hash from the raw bytes in SQL (the
    // PNG tier is lossless).
    "q_mm_image_neardup" -> { (s, dir) =>
      // persist the per-doc hash table: the plan reads it FOUR times
      // (both sides of the capped self-join and both rerank lookups),
      // and each uncached read re-runs the PNG encode + ImageIO decode
      // lineage — the dominant cost of this query. 5 narrow columns per
      // doc; the cache-manager entry is shared across repeat calls.
      // tracked for release via TextOps' queue: a bare persist leaked
      // one block-manager entry per invocation in long-lived processes
      val hs = TextOps.trackPersist(imageAHash(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      val bands = hs.select(col("doc_id"),
        expr("stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, band_val)"))
      val capped = bands
        .withColumn("bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("band_idx", "band_val")))
        .filter(col("bsz") <= ImgBucketCap)
        .drop("bsz")
      val cand = capped.as("x").join(capped.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      def side(pfx: String, idCol: String) = hs.select(
        col("doc_id").as(idCol), col("b0").as(s"${pfx}0"),
        col("b1").as(s"${pfx}1"), col("b2").as(s"${pfx}2"),
        col("b3").as(s"${pfx}3"))
      cand.join(side("a", "id_a"), "id_a").join(side("c", "id_b"), "id_b")
        .withColumn("hamming",
          (bit_count(col("a0").bitwiseXOR(col("c0"))) +
            bit_count(col("a1").bitwiseXOR(col("c1"))) +
            bit_count(col("a2").bitwiseXOR(col("c2"))) +
            bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int"))
        .filter(col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")
    },

    // REAL audio decode — the third codec tier (after lossless PNG and
    // lossy JPEG): genuine RIFF/WAVE bytes cross the DataFrame boundary
    // and javax.sound.sampled parses the container, yields the format,
    // and streams the PCM frames back. 8-bit PCM is lossless, so every
    // published statistic (sample count, rate, mean/peak amplitude,
    // first sample) is integer-exact and the oracle recomputes all of
    // them from the raw bytes without an audio library.
    "q_mm_wav_decode" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_samples", IntegerType, nullable = false),
        StructField("sample_rate", IntegerType, nullable = false),
        StructField("bits", IntegerType, nullable = false),
        StructField("mean_amp", LongType, nullable = false),
        StructField("peak_amp", IntegerType, nullable = false),
        StructField("s_first", IntegerType, nullable = false)))
      val out = wavAssets(s, dir).rdd.mapPartitions { it =>
        val reader = wavReader() // once per partition, see wavWriter scaladoc
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val wav = r.getAs[Array[Byte]]("content")
          val ais = reader.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val fmt = ais.getFormat
          val samples = ais.readAllBytes()
          require(samples.nonEmpty, s"doc $id: undecodable WAV payload")
          var sum = 0L
          var peak = 0
          var i = 0
          while (i < samples.length) {
            val v = samples(i) & 0xff
            sum += v
            if (v > peak) peak = v
            i += 1
          }
          Row(id, samples.length, fmt.getSampleRate.toInt,
            fmt.getSampleSizeInBits, sum / samples.length, peak,
            samples(0) & 0xff)
        }
      }
      s.createDataFrame(out, schema)
    },

    // REAL image decode + resize: ImageIO.read on genuine PNG bytes, then
    // nearest-neighbor resize of the decoded raster to a fixed 4×4 grid
    // (fixed output shape regardless of input size — the training-data
    // resize contract) plus a whole-image mean. All integer-exact on
    // lossless grayscale, so the oracle reproduces every pixel from the
    // original bytes without a codec.
    "q_mm_decode_resize" -> { (s, dir) =>
      val schema = StructType(
        StructField("doc_id", LongType, nullable = false) ::
        StructField("width", IntegerType, nullable = false) ::
        StructField("height", IntegerType, nullable = false) ::
        StructField("mean_gray", LongType, nullable = false) ::
        (for (i <- 0 until 4; j <- 0 until 4)
          yield StructField(s"nn_${i}_$j", IntegerType, nullable = false)).toList)
      val out = pngAssets(s, dir).rdd.mapPartitions { it =>
        // a production pipeline opens codec handles once per partition
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val png = r.getAs[Array[Byte]]("content")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          require(img != null, s"doc $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          val nn = for (i <- 0 until 4; j <- 0 until 4)
            yield raster.getSample(j * w / 4, i * h / 4, 0)
          Row.fromSeq(id +: w +: h +: (sum / (w.toLong * h)) +: nn)
        }
      }
      s.createDataFrame(out, schema)
    },

    // Per-partition imperative feature extraction over REAL decoded
    // images: ImageIO.read on genuine PNG bytes, then the published
    // features are properties of the decoded raster — dimensions,
    // pixel count, and a 16-bin luminance histogram over every decoded
    // sample. The mapPartitions boundary is where batch-level resources
    // (codec handles, model sessions) live in a real pipeline; only the
    // extracted features shuffle, never rasters. Lossless grayscale
    // means the oracle recomputes the histogram from the raw bytes plus
    // the zero-padded tail (w*h - n extra samples in bin 0).
    "q_mm_features" -> { (s, dir) =>
      val out = pngAssets(s, dir).rdd.mapPartitions { it =>
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val png = r.getAs[Array[Byte]]("content")
          val mime = r.getAs[String]("mime")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          require(img != null, s"doc $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val hist = new Array[Long](16)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              hist(raster.getSample(x, y, 0) >> 4) += 1
              x += 1
            }
            y += 1
          }
          Row(id, mime, w, h, w * h, hist.toSeq)
        }
      }
      val flat = Seq(col("doc_id"), col("mime"), col("width"),
        col("height"), col("n_pixels")) ++
        (0 until 16).map(i => col("hist")(i).as(s"hist_$i"))
      s.createDataFrame(out, featureSchema).select(flat: _*)
    },

    // REAL resize: ImageIO.read on genuine PNG bytes, then nearest-
    // neighbor resample of the decoded raster to a fixed 2×4 grid —
    // fixed output shape regardless of input size, the training-data
    // thumbnail contract (q_mm_decode_resize is the 4×4 sibling; this
    // one keeps the flat 8-sample strip surface). Integer-exact on
    // lossless grayscale, so the oracle reproduces every sample from
    // the original bytes without a codec.
    "q_mm_resize" -> { (s, dir) =>
      val schema = StructType(
        StructField("doc_id", LongType, nullable = false) +:
        StructField("width", IntegerType, nullable = false) +:
        StructField("height", IntegerType, nullable = false) +:
        (0 until 8).map(j => StructField(s"s_$j", IntegerType, nullable = false)))
      val out = pngAssets(s, dir).rdd.mapPartitions { it =>
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val png = r.getAs[Array[Byte]]("content")
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          require(img != null, s"doc $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val samples = for (i <- 0 until 2; j <- 0 until 4)
            yield raster.getSample(j * w / 4, i * h / 2, 0)
          Row.fromSeq(id +: w +: h +: samples)
        }
      }
      s.createDataFrame(out, schema)
    },

    // REAL video-container keyframe sampling — the fourth codec tier,
    // closing the one modality the stub tiers stood in for: genuine
    // multi-frame GIF containers cross the DataFrame boundary, the
    // reader parses the container for the frame count, and ONLY the
    // first/middle/last frames are decoded (reader.read(index) — the
    // keyframe discipline: a sampled decode never touches the other
    // frames' bitstreams). The identity-gray palette makes frames
    // lossless, so every published statistic (frame count, dims,
    // per-keyframe mean gray, first pixel) recomputes from the raw
    // bytes in SQL.
    "q_mm_gif_frames" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("m_first", LongType, nullable = false),
        StructField("m_mid", LongType, nullable = false),
        StructField("m_last", LongType, nullable = false),
        StructField("px_first", IntegerType, nullable = false)))
      val out = gifAssets(s, dir).rdd.mapPartitions { it =>
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val gif = r.getAs[Array[Byte]]("content")
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(gif))
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          require(n >= 1, s"doc $id: unreadable GIF container")
          def meanOf(idx: Int): Long = {
            val img = reader.read(idx)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += (img.getRGB(x, y) & 0xff)
                x += 1
              }
              y += 1
            }
            sum / (img.getWidth.toLong * img.getHeight)
          }
          val first = reader.read(0)
          val (w, h) = (first.getWidth, first.getHeight)
          val row = Row(id, n, w, h,
            meanOf(0), meanOf((n - 1) / 2), meanOf(n - 1),
            first.getRGB(0, 0) & 0xff)
          reader.dispose()
          iis.close()
          row
        }
      }
      s.createDataFrame(out, schema)
    },

    // REAL frame sampling: genuine multi-frame GIF containers are
    // parsed for the frame count and ONLY the first/middle/last frames
    // are decoded (reader.read(index) — the keyframe discipline); each
    // keyframe publishes its anchor pixel (0,0). Frame f holds payload
    // bytes [f*256, (f+1)*256) on the identity-gray palette, so pixel
    // (0,0) of frame f IS byte f*256 (0 for the empty payload) and the
    // oracle recomputes every column from the raw bytes.
    "q_mm_frame_sample" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_frames", IntegerType, nullable = false),
        StructField("f_first", IntegerType, nullable = false),
        StructField("f_mid", IntegerType, nullable = false),
        StructField("f_last", IntegerType, nullable = false)))
      val out = gifAssets(s, dir).rdd.mapPartitions { it =>
        noDiskCache()
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val gif = r.getAs[Array[Byte]]("content")
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(gif))
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          require(n >= 1, s"doc $id: unreadable GIF container")
          def anchor(idx: Int): Int = reader.read(idx).getRGB(0, 0) & 0xff
          val row = Row(id, n, anchor(0), anchor((n - 1) / 2), anchor(n - 1))
          reader.dispose()
          iis.close()
          row
        }
      }
      s.createDataFrame(out, schema)
    },

    // MP4 container probe — the VIDEO CONTAINER tier (what ffprobe
    // answers before any codec runs): genuine ISO-BMFF bytes cross the
    // DataFrame boundary and a recursive box-tree parse (Mp4.probe)
    // finds the durations in both timescales, the sample table and the
    // chunk offset, then reads the first payload byte THROUGH the stco
    // offset — a parser that didn't really walk the tree cannot
    // produce it. Every published column is an integer-exact function
    // of the payload, so the oracle recomputes all of them from the
    // raw bytes in SQL.
    "q_mm_mp4_probe" -> { (s, dir) =>
      val schema = StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("n_samples", LongType, nullable = false),
        StructField("duration_ms", LongType, nullable = false),
        StructField("media_duration", LongType, nullable = false),
        StructField("n_tracks", IntegerType, nullable = false),
        StructField("codec", StringType, nullable = false),
        StructField("mdat_bytes", IntegerType, nullable = false),
        StructField("m_first", IntegerType, nullable = false)))
      val out = mp4Assets(s, dir).rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getAs[Long]("doc_id")
          val p = Mp4.probe(r.getAs[Array[Byte]]("content"))
          require(p.movieTimescale == Mp4MovieTimescale &&
            p.mediaTimescale == Mp4MediaTimescale,
            s"doc $id: unexpected timescales $p")
          Row(id, p.nSamples, p.movieDuration, p.mediaDuration,
            p.nTracks, p.codec, p.mdatBytes, p.firstByte)
        }
      }
      s.createDataFrame(out, schema)
    }
  )

  /** oracle: the same histogram/dimensions computed in SQL over hex pairs
    * (documents' text is ASCII, so UTF-8 bytes == code units). */
  val oracles: Map[String, String] = Map(
    // the exact surface of the lossy tier: dimensions derive from the
    // byte count (the same geom as the PNG path), and the MAE verdict
    // must be TRUE for every document — a codec failure flips it
    "q_mm_jpeg_decode" ->
      """WITH a AS (
        | SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |SELECT doc_id,
        | CAST(LEAST(64, GREATEST(n, 1)) AS INT) AS width,
        | CAST((GREATEST(n, 1) + LEAST(64, GREATEST(n, 1)) - 1)
        |   // LEAST(64, GREATEST(n, 1)) AS INT) AS height,
        | CAST(n AS INT) AS src_bytes,
        | TRUE AS mae_ok
        |FROM a""".stripMargin,
    // PCM is lossless: decoded samples ARE the source bytes (one zero
    // sample for empty payloads), and the container echoes the encode
    // format — so every column recomputes from the bytes in SQL
    "q_mm_wav_decode" ->
      """WITH a AS (
        | SELECT doc_id, encode(text) AS c,
        |  GREATEST(octet_length(encode(text)), 1) AS n,
        |  octet_length(encode(text)) AS raw_n
        | FROM documents)
        |SELECT doc_id, CAST(n AS INT) AS n_samples,
        | 8000 AS sample_rate, 8 AS bits,
        | CAST(coalesce(list_aggregate(list_transform(range(raw_n),
        |    j -> CAST('0x' || substring(hex(c), 2*j + 1, 2) AS BIGINT)), 'sum'), 0)
        |   // n AS BIGINT) AS mean_amp,
        | CAST(coalesce(list_aggregate(list_transform(range(raw_n),
        |    j -> CAST('0x' || substring(hex(c), 2*j + 1, 2) AS BIGINT)), 'max'), 0)
        |   AS INT) AS peak_amp,
        | CASE WHEN raw_n = 0 THEN 0
        |  ELSE CAST('0x' || substring(hex(c), 1, 2) AS INT) END AS s_first
        |FROM a""".stripMargin,
    // the container carries the payload as 1-byte samples at 8 kHz with
    // a 1000-unit movie timescale, so every probed field is an exact
    // integer function of the byte count (one zero sample when empty)
    // and the first payload byte — the oracle needs no box grammar
    "q_mm_mp4_probe" ->
      """WITH a AS (
        | SELECT doc_id, encode(text) AS c,
        |  GREATEST(octet_length(encode(text)), 1) AS n,
        |  octet_length(encode(text)) AS raw_n
        | FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        | CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
        | CAST(n AS BIGINT) AS media_duration,
        | 1 AS n_tracks, 'twos' AS codec,
        | CAST(n AS INT) AS mdat_bytes,
        | CASE WHEN raw_n = 0 THEN 0
        |  ELSE CAST('0x' || substring(hex(c), 1, 2) AS INT) END AS m_first
        |FROM a""".stripMargin,
    // reproduces the decoded raster arithmetic from the raw bytes:
    // grayscale PNG is lossless, so pixel(y*w+x) = byte(y*w+x) (0 in the
    // zero-padded tail), and the nearest-neighbor grid + mean are
    // integer-exact on both engines
    "q_mm_decode_resize" -> {
      def byteAt(idx: String) =
        s"CASE WHEN $idx < n THEN CAST('0x' || substring(hex(c), 2*($idx) + 1, 2) AS INT) ELSE 0 END"
      val nn = (for (i <- 0 until 4; j <- 0 until 4) yield
        s"${byteAt(s"(($i*h)//4)*w + (($j*w)//4)")} AS nn_${i}_$j").mkString(",\n ")
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n
        | FROM documents),
        |d AS (
        | SELECT doc_id, c, n,
        |  LEAST(64, GREATEST(n, 1)) AS w,
        |  (GREATEST(n, 1) + LEAST(64, GREATEST(n, 1)) - 1) // LEAST(64, GREATEST(n, 1)) AS h
        | FROM a)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        | CAST(coalesce(list_aggregate(list_transform(range(n),
        |   j -> CAST('0x' || substring(hex(c), 2*j + 1, 2) AS BIGINT)), 'sum'), 0)
        |  // (w * h) AS BIGINT) AS mean_gray,
        | $nn
        |FROM d""".stripMargin
    },
    "q_mm_image_neardup" -> {
      def sampleAt(k: Int) = {
        val idx = s"(((${k / 8}*h)//8)*w + ((${k % 8}*w)//8))"
        s"CASE WHEN $idx < n THEN CAST('0x' || substring(hex(c), 2*($idx) + 1, 2) AS INT) ELSE 0 END"
      }
      val sCols = (0 until 64).map(k => s"${sampleAt(k)} AS s_$k").mkString(",\n ")
      val meanExpr = (0 until 64).map(k => s"s_$k").mkString(" + ")
      val bandExpr = (0 until 4).map { b =>
        val bits = (0 until 16).map { o =>
          s"CASE WHEN s_${16 * b + o} > m THEN ${1 << o} ELSE 0 END"
        }.mkString(" + ")
        s"CAST($bits AS INT) AS b$b"
      }.mkString(",\n ")
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n
        | FROM documents),
        |d AS (
        | SELECT doc_id, c, n, LEAST(64, GREATEST(n, 1)) AS w,
        |  (GREATEST(n, 1) + LEAST(64, GREATEST(n, 1)) - 1) // LEAST(64, GREATEST(n, 1)) AS h
        | FROM a),
        |samp AS (SELECT doc_id, $sCols FROM d),
        |wm AS (SELECT *, ($meanExpr) // 64 AS m FROM samp),
        |hs AS (SELECT doc_id, $bandExpr FROM wm),
        |bands AS (
        | SELECT doc_id, 0 AS band_idx, b0 AS band_val FROM hs
        | UNION ALL SELECT doc_id, 1, b1 FROM hs
        | UNION ALL SELECT doc_id, 2, b2 FROM hs
        | UNION ALL SELECT doc_id, 3, b3 FROM hs),
        |capped AS (
        | SELECT doc_id, band_idx, band_val FROM (
        |  SELECT *, count(*) OVER (PARTITION BY band_idx, band_val) AS bsz
        |  FROM bands)
        | WHERE bsz <= $ImgBucketCap),
        |cand AS (
        | SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        | FROM capped x JOIN capped y
        |  ON x.band_idx = y.band_idx AND x.band_val = y.band_val
        |   AND x.doc_id < y.doc_id),
        |scored AS (
        | SELECT c.id_a, c.id_b,
        |  CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
        |   + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3)) AS INT) AS hamming
        | FROM cand c JOIN hs ha ON ha.doc_id = c.id_a
        |  JOIN hs hb ON hb.doc_id = c.id_b)
        |SELECT id_a, id_b, hamming FROM scored WHERE hamming <= 8""".stripMargin
    },
    // decoded-raster histogram: the raster holds the n source bytes plus
    // (w*h - n) zero-padded tail samples, so bin 0 gets the pad on top
    // of the bytes whose high nibble is 0; all other bins are pure
    // byte counts (grayscale PNG is lossless)
    "q_mm_features" -> {
      def nibbleCount(i: Int) =
        s"""len(list_filter(range(0, n),
           | j -> CAST('0x' || substring(hex(c), 2*j + 1, 1) AS INT) = $i))""".stripMargin
      val hist = (0 until 16).map { i =>
        if (i == 0) s"CAST(${nibbleCount(i)} + (w*h - n) AS BIGINT) AS hist_$i"
        else s"CAST(${nibbleCount(i)} AS BIGINT) AS hist_$i"
      }.mkString(",\n ")
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n
        | FROM documents),
        |d AS (
        | SELECT doc_id, c, n, LEAST(64, GREATEST(n, 1)) AS w,
        |  (GREATEST(n, 1) + LEAST(64, GREATEST(n, 1)) - 1) // LEAST(64, GREATEST(n, 1)) AS h
        | FROM a)
        |SELECT doc_id, 'image/png' AS mime,
        | CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        | CAST(w*h AS INT) AS n_pixels,
        | $hist
        |FROM d""".stripMargin
    },
    // the 2×4 nearest-neighbor grid over the decoded raster: sample
    // (i,j) is pixel ((i*h/2)*w + j*w/4), i.e. that source byte (0 in
    // the zero-padded tail)
    "q_mm_resize" -> {
      def byteAt(idx: String) =
        s"CASE WHEN $idx < n THEN CAST('0x' || substring(hex(c), 2*($idx) + 1, 2) AS INT) ELSE 0 END"
      val samples = (for (i <- 0 until 2; j <- 0 until 4) yield
        s"${byteAt(s"(($i*h)//2)*w + (($j*w)//4)")} AS s_${i * 4 + j}").mkString(",\n ")
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n
        | FROM documents),
        |d AS (
        | SELECT doc_id, c, n, LEAST(64, GREATEST(n, 1)) AS w,
        |  (GREATEST(n, 1) + LEAST(64, GREATEST(n, 1)) - 1) // LEAST(64, GREATEST(n, 1)) AS h
        | FROM a)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        | $samples
        |FROM d""".stripMargin
    },
    // lossless identity-gray frames: frame f holds bytes
    // [f*256, (f+1)*256) zero-padded, so each keyframe's mean (and the
    // first pixel) recomputes from the hex pairs; the container frame
    // count is the byte-count geometry
    "q_mm_gif_frames" -> {
      def frameMean(f: String) =
        s"""CAST(coalesce(list_aggregate(list_transform(
           |   range(($f)*256, LEAST((($f)+1)*256, n)),
           |   j -> CAST('0x' || substring(hex(c), 2*j + 1, 2) AS BIGINT)), 'sum'), 0)
           |  // 256 AS BIGINT)""".stripMargin
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n,
        |  greatest(1, CAST((octet_length(encode(text)) + 255) // 256 AS INT)) AS n_frames
        | FROM documents)
        |SELECT doc_id, n_frames, 16 AS width, 16 AS height,
        | ${frameMean("0")} AS m_first,
        | ${frameMean("(n_frames-1)//2")} AS m_mid,
        | ${frameMean("n_frames-1")} AS m_last,
        | CASE WHEN n = 0 THEN 0
        |  ELSE CAST('0x' || substring(hex(c), 1, 2) AS INT) END AS px_first
        |FROM a""".stripMargin
    },
    // pixel (0,0) of keyframe f = byte f*256 (frame f starts at byte
    // f*256 and f*256 < n for every sampled frame when n > 0; the empty
    // payload is one zero frame)
    "q_mm_frame_sample" -> {
      def anchorAt(f: String) =
        s"""CASE WHEN n = 0 THEN 0
           | ELSE CAST('0x' || substring(hex(c), 2*(($f)*256) + 1, 2) AS INT) END""".stripMargin
      s"""WITH a AS (
        | SELECT doc_id, encode(text) AS c, octet_length(encode(text)) AS n,
        |  greatest(1, CAST((octet_length(encode(text)) + 255) // 256 AS INT)) AS n_frames
        | FROM documents)
        |SELECT doc_id, n_frames,
        | ${anchorAt("0")} AS f_first,
        | ${anchorAt("(n_frames-1)//2")} AS f_mid,
        | ${anchorAt("n_frames-1")} AS f_last
        |FROM a""".stripMargin
    }
  )
}

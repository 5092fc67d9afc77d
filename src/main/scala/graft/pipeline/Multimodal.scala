package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque `binary`
  * columns with a typed metadata struct alongside. The Spark-side machinery
  * (schema, batching, partition sizing) is real. IMAGES decode for real via
  * the JDK's own `javax.imageio` readers ([[decodeImage]]/[[decodeImages]] —
  * PNG/JPEG/GIF/BMP ship with Java SE, no external media libs needed); AUDIO
  * decodes for real for WAV/PCM containers ([[decodeWav]]/[[decodeAudio]] —
  * RIFF parsing is pure `java.nio`, no codec lib required). VIDEO decodes
  * for real for BOTH multi-frame formats the JDK can handle — animated GIF
  * ([[gifFrames]]/[[decodeGifFrames]]) and Motion-JPEG in an AVI container
  * ([[mjpegFrames]]/[[decodeMjpegFrames]]: pure-JVM RIFF walk + the
  * bundled JPEG reader, per-frame sampling + luminance). For inter-frame
  * compressed codecs (H.264/HEVC/VP9/AV1) the CONTAINER parses for real —
  * [[mp4Meta]]/[[videoContainerMeta]] walk the ISO-BMFF atoms for
  * duration, track layout, codec fourcc and resolution, so the modality is
  * never payload-blind; only their FRAME decode keeps the clearly-marked
  * deterministic stub ([[stubDecode]] — no JDK codec exists; swap in a
  * JNI/FFM binding without touching the plan shape).
  *
  * Scale notes: payloads dominate row size, so `spark.sql.files.maxPartitionBytes`
  * governs batch memory; feature extraction is `mapPartitions` over an
  * iterator (constant memory, no per-row task overhead); metadata-only
  * queries never deserialize payloads thanks to parquet column pruning.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)
  ))

  /** Wrap a text table into a blob table: payload = utf-8 bytes, metadata
    * struct populated. Stands in for "read a directory of media files"
    * (which in production is `spark.read.format("binaryFile")`).
    */
  def toBlobTable(df: DataFrame, idCol: String, textCol: String, modality: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit(modality).as("modality"),
        lit("utf8").as("format"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height")
      ).as("meta"))

  /** Deterministic stand-in for a media decoder: 16-bin byte histogram,
    * L1-normalized. Real decode/resize/frame-sample plugs in here; the
    * iterator shape (mapPartitions, bounded memory) is the production shape.
    */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) { bins((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    val n = payload.length.toDouble
    var b = 0
    while (b < 16) { bins(b) /= n; b += 1 }
    bins
  }

  /** Feature extraction over the blob table: (id, features). Distributed via
    * typed mapPartitions; payload bytes stream through one partition at a
    * time (bounded memory — the batch shape a real decoder needs).
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, stubDecode(payload)) })
      .toDF(idCol, "features")
  }

  /** Max pixels a payload may claim before we decode it: a few-hundred-byte
    * "bomb" PNG whose header claims 100000×100000 would make ImageIO try a
    * multi-GB raster allocation (an OutOfMemoryError — NOT catchable as
    * Exception — killing the task). Dimensions are read from the HEADER
    * only (no pixel decode) and oversized payloads are rejected as
    * undecodable. 16M px = 4096² ≈ 64 MB ARGB.
    */
  val MaxImagePixels: Long = 16L * 1024 * 1024

  /** Decode via an explicit in-memory stream: the ImageIO.read(InputStream)
    * default spools every payload through a temp FILE on executor disk
    * (FileCacheImageInputStream) — pure overhead for byte arrays, and a
    * hard failure on read-only tmpdirs. Returns null when no reader claims
    * the bytes or the claimed dimensions exceed [[MaxImagePixels]].
    */
  private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(stream, true, true)
        // header-only dimension probe BEFORE any raster allocation
        val (w, h) = (reader.getWidth(0), reader.getHeight(0))
        if (w <= 0 || h <= 0 || w.toLong * h > MaxImagePixels) null
        else reader.read(0)
      } finally reader.dispose()
    } finally stream.close()
  }

  /** REAL image decode via the JDK's bundled ImageIO readers: returns
    * (width, height, 16-bin L1-normalized luminance histogram), or None
    * when the payload is not a decodable image (wrong magic, truncated
    * file, bomb header). Deterministic: integer Rec.601 luma, row-major
    * scan via bulk row reads (per-pixel getRGB pays a ColorModel lookup
    * per call).
    */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val bins = new Array[Double](16)
        val row  = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            bins(lum >> 4) += 1.0
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        var b = 0
        while (b < 16) { bins(b) /= n; b += 1 }
        Some((w, h, bins))
      }
    } catch { case _: Exception => None }
  }

  /** Distributed REAL image decode over the blob table: width/height/feature
    * columns from actual pixel data (null for undecodable payloads — report
    * them, don't fail the job). Same bounded-memory mapPartitions shape as
    * [[extractFeatures]]; one image is decoded at a time per task.
    */
  def decodeImages(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeImage(payload) match {
          case Some((w, h, feats)) => (id, Some(w), Some(h), Some(feats))
          case None                => (id, None, None, None)
        }
      })
      .toDF(idCol, "width", "height", "features")
  }

  /** REAL image thumbnail: decode, scale to fit `maxDim` (aspect-preserving,
    * never upscales), re-encode as PNG. Returns None for undecodable
    * payloads. Uses AWT's headless-safe Graphics2D bilinear scaling — all
    * JDK, no external codec.
    */
  def resizeImage(payload: Array[Byte], maxDim: Int): Option[(Array[Byte], Int, Int)] = {
    require(maxDim > 0)
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) return None
      val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      val (w, h) = (math.max(1, math.round(img.getWidth * scale).toInt),
                    math.max(1, math.round(img.getHeight * scale).toInt))
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val bytes = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bytes)
      Some((bytes.toByteArray, w, h))
    } catch { case _: Exception => None }
  }

  /** Distributed real image thumbnailing. ONLY rows whose
    * `meta.modality == imageModality` are decoded — a non-image payload
    * whose leading bytes happen to match an image magic must not be
    * silently replaced by a lossy thumbnail. Resized rows get re-encoded
    * PNG payloads with meta format/n_bytes/width/height updated;
    * everything else (other modalities, undecodable images) passes through
    * with payload AND meta fully untouched. Same map shape as
    * [[resizePayloads]].
    */
  def resizeImages(df: DataFrame, idCol: String, maxDim: Int,
      imageModality: String = "image"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"),
        col("meta.modality"), col("meta.format"), col("meta.n_bytes"),
        col("meta.width"), col("meta.height"))
      .as[(Long, Array[Byte], String, String, Long, Option[Int], Option[Int])]
      .mapPartitions(_.map { case (id, payload, modality, format, nBytes, w0, h0) =>
        (if (modality == imageModality) resizeImage(payload, maxDim) else None) match {
          case Some((bytes, w, h)) =>
            (id, bytes, modality, "png", bytes.length.toLong, Some(w), Some(h))
          case None => // full passthrough: original payload AND meta
            (id, payload, modality, format, nBytes, w0, h0)
        }
      })
      .toDF(idCol, "payload", "modality", "format", "n_bytes", "width", "height")
      .select(col(idCol), col("payload"),
        struct(col("modality"), col("format"), col("n_bytes"),
          col("width"), col("height")).as("meta"))
  }

  /** dHash grid: 9 columns × 8 rows of luma, 8 horizontal gradient
    * comparisons per row = a 64-bit signature. The standard perceptual
    * difference-hash (see e.g. the reference's PUBLIC near-dup discussion;
    * the algorithm itself is the widely-published dHash).
    */
  val DHashCols = 9
  val DHashRows = 8

  /** Perceptual difference-hash of an image payload: REAL decode via the
    * JDK readers, bilinear downscale to the 9×8 luma grid, bit `y*8+x` set
    * iff `luma(x,y) > luma(x+1,y)`. Gradient-based, so it is invariant to
    * global brightness shifts and (by the downscale) to resolution — the
    * property that makes it a NEAR-duplicate key where an exact byte
    * digest sees two unrelated files. Returns None for undecodable
    * payloads. Deterministic: integer Rec.601 luma over the same scaling
    * path as [[resizeImage]].
    */
  def dHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = readImage(payload)
      if (img == null) None else Some(dHashImage(img))
    } catch { case _: Exception => None }
  }

  /** [[dHash]] of an already-decoded raster — the shared kernel for the
    * single-image path and the per-frame video path ([[videoFrameHashes]]).
    */
  def dHashImage(img: java.awt.image.BufferedImage): Long = {
    val grid = new java.awt.image.BufferedImage(DHashCols, DHashRows,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = grid.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, DHashCols, DHashRows, null)
    g.dispose()
    val luma = Array.ofDim[Int](DHashRows, DHashCols)
    val row  = new Array[Int](DHashCols)
    var y = 0
    while (y < DHashRows) {
      grid.getRGB(0, y, DHashCols, 1, row, 0, DHashCols)
      var x = 0
      while (x < DHashCols) {
        val rgb = row(x)
        luma(y)(x) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
    var sig = 0L
    y = 0
    while (y < DHashRows) {
      var x = 0
      while (x < DHashCols - 1) {
        if (luma(y)(x) > luma(y)(x + 1)) sig |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  /** Distributed perceptual hashing over the blob table: (id, dhash), null
    * for undecodable payloads (report, don't fail — the [[decodeImages]]
    * contract). Bounded-memory mapPartitions; one image decoded at a time
    * per task, so a 100 TB image corpus streams through at
    * maxPartitionBytes-sized batches.
    */
  def imageHashes(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, dHash(payload)) })
      .toDF(idCol, "dhash")
  }

  /** Image near-duplicate pairs within `maxHamming` perceptual-hash bits:
    * [[dHash]] signatures through the banded-Hamming candidate join
    * ([[Dedup.hammingNearDups]] — the SimHash machinery, shared because
    * both live in 64-bit Hamming space). Undecodable payloads drop out
    * (no signature → no pair) rather than failing the job. Never
    * all-pairs: candidates come from band-bucket equality, the scale
    * shape at a 100 TB image corpus. Output: (id_a, id_b, hamming).
    */
  def imageNearDups(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDups(
      imageHashes(df, idCol).filter(col("dhash").isNotNull),
      idCol, "dhash", maxHamming)

  /** Incremental image near-dup: new arrivals against the PERSISTED
    * signature artifact ([[imageHashes]] written to parquet once per
    * ingest — 8 bytes/image regardless of payload size). Only the new
    * batch decodes pixels; the prior corpus contributes signatures alone
    * ([[Dedup.hammingNearDupsAgainstPrior]]), so gating a batch is
    * independent of corpus size — the ingest-door shape of
    * [[Dedup.nearDupsAgainstPrior]] for the image modality.
    */
  def imageNearDupsAgainstPrior(
      newDf: DataFrame,
      priorSigs: DataFrame,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDupsAgainstPrior(
      imageHashes(newDf, idCol).filter(col("dhash").isNotNull),
      priorSigs, idCol, "dhash", maxHamming)

  /** Single-decode curation scan: ONE codec pass per payload yields both
    * the perceptual dedup signature ([[dHashImage]]) and the quality
    * signal (mean integer Rec.601 luma) plus the raster dimensions —
    * the full-pipeline face ([[graft.Queries.imageCurate]]) must not pay
    * two decodes for two downstream stages, and at a 100 TB image corpus
    * the decode IS the dominant cost. Undecodable payloads yield an
    * all-null row (report, don't fail — the [[decodeImages]] contract),
    * which downstream curation surfaces as its own disposition. Bounded
    * memory: one image decoded at a time per task.
    */
  def imageCurationScan(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val decoded =
          if (payload == null || payload.isEmpty) None
          else try Option(readImage(payload)) catch { case _: Exception => None }
        decoded match {
          case Some(img) =>
            (id, Some(dHashImage(img)), Some(meanLumaOf(img)),
              Some(img.getWidth), Some(img.getHeight))
          case None => (id, None, None, None, None)
        }
      })
      .toDF(idCol, "dhash", "mean_luma", "width", "height")
  }

  // ------------------------------------------------------------ JPEG / EXIF

  /** EXIF facts a curation pass needs without decoding pixels: orientation
    * (tag 0x0112 — whether the raster needs rotating before any vision
    * model sees it), the capture timestamp (tag 0x0132), and whether a GPS
    * IFD is present (tag 0x8825) — location presence is a PII-exposure
    * column for the privacy family's audits, read as a BOOLEAN so the
    * coordinates themselves never leave the payload.
    */
  final case class ExifInfo(
      orientation: Option[Int],
      dateTime: Option[String],
      hasGps: Boolean)

  /** Bounded EXIF header walk over a JPEG payload: JFIF segment scan to the
    * APP1 `Exif\0\0` block, then the TIFF IFD0 walk in either byte order.
    * Same claims-clamped discipline as [[mp4Meta]]: every segment length,
    * IFD offset and value count is a CLAIM checked against the real
    * payload bounds; nothing is allocated proportional to a claim, a
    * truncated or forged header yields missing fields, never a throw.
    * Returns None for non-JPEG bytes; Some with empty fields for a JPEG
    * without EXIF (a real and common layout the caller must distinguish
    * from "not an image").
    */
  def jpegExif(payload: Array[Byte]): Option[ExifInfo] = {
    if (payload == null || payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xFF || (payload(1) & 0xff) != 0xD8) return None
    try {
      def parseTiff(base: Int, end: Int): ExifInfo = {
        val empty = ExifInfo(None, None, hasGps = false)
        if (base + 8 > end) return empty
        val le =
          if (payload(base) == 'I' && payload(base + 1) == 'I') true
          else if (payload(base) == 'M' && payload(base + 1) == 'M') false
          else return empty
        def u16(off: Int): Int =
          if (off < base || off + 2 > end) -1
          else if (le) (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
          else ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)
        def u32(off: Int): Long =
          if (off < base || off + 4 > end) -1L
          else if (le) (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
            ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
          else ((payload(off) & 0xffL) << 24) | ((payload(off + 1) & 0xffL) << 16) |
            ((payload(off + 2) & 0xffL) << 8) | (payload(off + 3) & 0xffL)
        if (u16(base + 2) != 42) return empty
        val ifdOff = u32(base + 4)
        if (ifdOff < 0 || base + ifdOff + 2 > end) return empty
        val ifd = (base + ifdOff).toInt
        val n = u16(ifd)
        var orientation: Option[Int] = None
        var dateTime: Option[String] = None
        var hasGps = false
        var i = 0
        while (i < n) {
          val e = ifd + 2 + 12 * i
          if (e + 12 > end) i = n // truncated entry list: stop cleanly
          else {
            val tag = u16(e)
            val typ = u16(e + 2)
            val cnt = u32(e + 4)
            tag match {
              case 0x0112 if typ == 3 && cnt >= 1 =>
                // SHORT values are left-justified in the 4-byte field
                val v = u16(e + 8)
                if (v >= 1 && v <= 8) orientation = Some(v)
              case 0x0132 if typ == 2 && cnt >= 1 && cnt <= 64 =>
                val off = if (cnt <= 4) e + 8 else (base + u32(e + 8)).toInt
                if (off >= base && off + cnt <= end) {
                  val raw = new String(payload, off, cnt.toInt,
                    java.nio.charset.StandardCharsets.US_ASCII)
                  val s = raw.takeWhile(_ != '\u0000').trim
                  if (s.nonEmpty) dateTime = Some(s)
                }
              case 0x8825 => hasGps = true // presence only, never the coords
              case _ => ()
            }
            i += 1
          }
        }
        ExifInfo(orientation, dateTime, hasGps)
      }
      var pos = 2
      var out = ExifInfo(None, None, hasGps = false)
      var done = false
      while (!done && pos + 4 <= payload.length) {
        if ((payload(pos) & 0xff) != 0xFF) done = true
        else {
          val marker = payload(pos + 1) & 0xff
          if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) pos += 2
          else {
            val len = ((payload(pos + 2) & 0xff) << 8) | (payload(pos + 3) & 0xff)
            if (len < 2 || marker == 0xDA) done = true // SOS: entropy follows
            else {
              val segStart = pos + 4
              val segEnd = math.min(pos + 2 + len, payload.length)
              if (marker == 0xE1 && segStart + 6 <= segEnd &&
                  payload(segStart) == 'E' && payload(segStart + 1) == 'x' &&
                  payload(segStart + 2) == 'i' && payload(segStart + 3) == 'f' &&
                  payload(segStart + 4) == 0 && payload(segStart + 5) == 0) {
                out = parseTiff(segStart + 6, segEnd)
                done = true
              }
              pos = pos + 2 + len
            }
          }
        }
      }
      Some(out)
    } catch { case _: Exception => None }
  }

  /** Fixture twin of [[jpegExif]] (the [[encodeMp4Container]] convention):
    * splice a structurally-valid APP1 EXIF segment — TIFF header in either
    * byte order, IFD0 with orientation/DateTime/GPS-pointer entries, the
    * GPS IFD itself an empty-but-well-formed table — right after a real
    * JPEG's SOI marker, where every real camera writes it.
    */
  def insertExif(
      jpeg: Array[Byte],
      orientation: Option[Int],
      dateTime: Option[String],
      gps: Boolean,
      littleEndian: Boolean = false): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xFF && (jpeg(1) & 0xff) == 0xD8,
      "insertExif: not a JPEG payload")
    dateTime.foreach(s => require(s.length < 64, "dateTime too long"))
    val n = orientation.size + dateTime.size + (if (gps) 1 else 0)
    val ifdLen = 2 + 12 * n + 4
    val dtLen = dateTime.map(_.length + 1).getOrElse(0)
    val tiffLen = 8 + ifdLen + dtLen + (if (gps) 6 else 0)
    val tiff = java.nio.ByteBuffer.allocate(tiffLen)
    tiff.order(if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
               else java.nio.ByteOrder.BIG_ENDIAN)
    tiff.put((if (littleEndian) "II" else "MM").getBytes("US-ASCII"))
    tiff.putShort(42).putInt(8) // magic, IFD0 offset
    tiff.putShort(n.toShort)
    val dtOff = 8 + ifdLen
    val gpsOff = dtOff + dtLen
    orientation.foreach { o => // tag, type SHORT, count, left-justified value
      tiff.putShort(0x0112).putShort(3).putInt(1)
      tiff.putShort(o.toShort).putShort(0) // left-justified in either order
    }
    dateTime.foreach { s =>
      tiff.putShort(0x0132).putShort(2).putInt(s.length + 1).putInt(dtOff)
    }
    if (gps) tiff.putShort(0x8825.toShort).putShort(4).putInt(1).putInt(gpsOff)
    tiff.putInt(0) // next IFD
    dateTime.foreach { s =>
      tiff.put(s.getBytes("US-ASCII")).put(0.toByte)
    }
    if (gps) tiff.putShort(0).putInt(0) // empty GPS IFD: 0 entries, no next
    val body = tiff.array()
    val app1Len = 2 + 6 + body.length // length field + "Exif\0\0" + TIFF
    val out = java.nio.ByteBuffer.allocate(jpeg.length + 2 + app1Len)
    out.put(jpeg, 0, 2) // SOI
    out.put(0xFF.toByte).put(0xE1.toByte).putShort(app1Len.toShort)
    out.put("Exif".getBytes("US-ASCII")).put(0.toByte).put(0.toByte)
    out.put(body)
    out.put(jpeg, 2, jpeg.length - 2)
    out.array()
  }

  /** Distributed EXIF extraction over the blob table: (id, orientation,
    * date_time, has_gps). NULL row for non-JPEG payloads; a JPEG without
    * EXIF reads as (null, null, false). Header-only — the same
    * parquet-speed scan shape as [[videoContainerMeta]].
    */
  def exifMetadata(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        jpegExif(p) match {
          case Some(e) => (id, e.orientation, e.dateTime, Some(e.hasGps))
          case None    => (id, None, None, None)
        }
      })
      .toDF(idCol, "orientation", "date_time", "has_gps")
  }

  /** Deterministic stand-in for a resize: sample the payload down to
    * `targetBytes` evenly-spaced bytes (a real image resize keeps this map
    * signature: bytes in, smaller bytes out).
    */
  def stubResize(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    if (payload == null || payload.length <= targetBytes) return payload
    val out  = new Array[Byte](targetBytes)
    val step = payload.length.toDouble / targetBytes
    var i = 0
    while (i < targetBytes) { out(i) = payload((i * step).toInt); i += 1 }
    out
  }

  /** Distributed resize over the blob table: payload replaced by its resized
    * form, metadata's `n_bytes` updated. Map-shaped mapPartitions — the
    * production signature for image thumbnailing.
    */
  def resizePayloads(df: DataFrame, idCol: String, targetBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"),
        col("meta.modality"), col("meta.format"))
      .as[(Long, Array[Byte], String, String)]
      .mapPartitions(_.map { case (id, payload, modality, format) =>
        val r = stubResize(payload, targetBytes)
        (id, r, modality, format, if (r == null) 0L else r.length.toLong)
      })
      .toDF(idCol, "payload", "modality", "format", "n_bytes")
      .select(col(idCol), col("payload"),
        struct(col("modality"), col("format"), col("n_bytes"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height")).as("meta"))
  }

  /** Frame sampling: treat the payload as fixed-size frames and emit every
    * `everyN`-th frame as its own row (id, frame_idx, frame). One-to-many
    * iterator shape — the production signature for video frame extraction,
    * where output rows far outnumber inputs and must stream through the
    * partition without materializing a file's full frame list.
    */
  def frameSample(
      df: DataFrame,
      idCol: String,
      frameBytes: Int,
      everyN: Int): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        if (payload == null) Iterator.empty
        else Iterator.range(0, payload.length / frameBytes)
          .filter(_ % everyN == 0)
          .map(f => (id, f.toLong,
            java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes)))
      })
      .toDF(idCol, "frame_idx", "frame")
  }

  // ------------------------------------------------------------------ video

  /** REAL multi-frame decode for animated GIF — the one video-ish container
    * the JDK can decode without an external codec (ImageIO's bundled GIF
    * reader exposes every frame of an animation). Emits one row per sampled
    * frame: (frame_idx, width, height, mean integer-Rec.601 luminance of
    * the frame patch AS DELIVERED — GIF disposal/compositing between frames
    * is NOT applied, each patch is what the decoder yields for that frame).
    * Compressed-codec video (H.264/VP9/…) stays out of reach in this
    * sandbox; this is the real plumbing a JNI/FFM codec binding would slot
    * into, exercised end-to-end on a genuinely multi-frame format.
    *
    * Per-frame dimensions are probed from the header BEFORE any raster
    * allocation and bomb-guarded by [[MaxImagePixels]] like single-image
    * decode; an oversized or broken frame is skipped, not fatal.
    */
  def gifFrames(payload: Array[Byte], everyN: Int): Seq[(Int, Int, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
    foreachGifFrame(payload, everyN) { (i, img) =>
      out += ((i, img.getWidth, img.getHeight, meanLumaOf(img)))
    }
    out.toSeq
  }

  /** The GIF multi-frame walk factored as a visitor so every per-frame
    * consumer ([[gifFrames]] luma stats, [[videoFrameHashes]] perceptual
    * hashes) shares ONE decode path with the same bomb guards.
    */
  private def foreachGifFrame(payload: Array[Byte], everyN: Int)(
      visit: (Int, java.awt.image.BufferedImage) => Unit): Unit = {
    require(everyN > 0)
    if (payload == null || payload.isEmpty) return
    try {
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) return
        val reader = readers.next()
        try {
          // seekForwardOnly=false: getNumImages(allowSearch) walks the file
          reader.setInput(stream, false, true)
          val n = reader.getNumImages(true)
          var i = 0
          while (i < n) {
            if (i % everyN == 0) {
              val w = reader.getWidth(i)
              val h = reader.getHeight(i)
              if (w > 0 && h > 0 && w.toLong * h <= MaxImagePixels)
                visit(i, reader.read(i))
            }
            i += 1
          }
        } finally reader.dispose()
      } finally stream.close()
    } catch { case _: Exception => () }
  }

  /** Distributed multi-frame decode over the blob table: one output row per
    * sampled frame, streaming one-to-many through the partition (the same
    * bounded-memory flatMap shape as [[frameSample]], now with REAL frames).
    */
  def decodeGifFrames(df: DataFrame, idCol: String, everyN: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        gifFrames(payload, everyN).iterator.map { case (f, w, h, luma) =>
          (id, f.toLong, w, h, luma)
        }
      })
      .toDF(idCol, "frame_idx", "width", "height", "mean_luma")
  }

  /** Animated-GIF encoder (test/query fixture; pure ImageIO, no metadata
    * frills — the default sequence write yields a decodable multi-image
    * GIF).
    */
  def encodeGifAnimation(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  // ----------------------------------------------------------- video (MJPEG)

  /** Mean integer-Rec.601 luminance of a decoded frame (shared by the GIF
    * and MJPEG paths): bulk row reads, integer luma per pixel.
    */
  /** Exact integer sum of per-pixel Rec.601 luma — the summation half of
    * [[meanLumaOf]], exposed separately so ratio-of-integers consumers
    * ([[videoCurationScan]]) never round-trip through the double mean.
    */
  private def lumaSumOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
    sum
  }

  private def meanLumaOf(img: java.awt.image.BufferedImage): Double =
    lumaSumOf(img).toDouble / (img.getWidth.toLong * img.getHeight)

  /** REAL compressed-container video decode without any external codec:
    * Motion-JPEG in an AVI (RIFF) container — every frame is a complete
    * JPEG, and the JDK ships a JPEG reader, so a pure-JVM RIFF chunk walk
    * (`LIST movi` → `??dc`/`??db` frame chunks, same `java.nio` discipline
    * as [[decodeWav]]) plus `ImageIO` per frame decodes the whole stream.
    * Emits one `(frame_idx, width, height, mean_luma)` per sampled frame,
    * exactly [[gifFrames]]'s shape.
    *
    * Robustness: chunk sizes are CLAIMS — every offset is clamped to the
    * payload length; each frame's dimensions are header-probed and
    * bomb-guarded by [[MaxImagePixels]] inside [[readImage]]; a broken or
    * oversized frame is skipped, not fatal. Inter-frame-compressed FRAME
    * decode (H.264/VP9/…) remains out of JDK reach — [[stubDecode]] stays
    * its documented placeholder and this walker is the slot a JNI/FFM codec
    * binding would fill — but their containers still parse for real via
    * [[mp4Meta]], so even undecodable payloads stay queryable by duration,
    * codec and resolution.
    */
  def mjpegFrames(payload: Array[Byte], everyN: Int): Seq[(Int, Int, Int, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double)]
    foreachMjpegFrame(payload, everyN) { (i, img) =>
      out += ((i, img.getWidth, img.getHeight, meanLumaOf(img)))
    }
    out.toSeq
  }

  /** The MJPEG/AVI frame walk factored as a visitor ([[foreachGifFrame]]'s
    * twin): same claims-clamped RIFF discipline, shared by the luma stats
    * and the perceptual-hash paths.
    */
  private def foreachMjpegFrame(payload: Array[Byte], everyN: Int)(
      visit: (Int, java.awt.image.BufferedImage) => Unit): Unit = {
    require(everyN > 0)
    if (payload == null || payload.length < 12) return
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      var frameIdx = 0
      var pos = 12
      while (pos + 8 <= payload.length) {
        val id   = tag(pos)
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL
        val start = pos + 8
        if (id == "LIST" && start + 4 <= payload.length && tag(start) == "movi") {
          // walk the frame chunks inside the movi list, clamped to reality
          val listEnd = math.min(start + size, payload.length.toLong).toInt
          var p = start + 4
          while (p + 8 <= listEnd) {
            val cid   = tag(p)
            val csize = bb.getInt(p + 4).toLong & 0xffffffffL
            val cstart = p + 8
            val cend   = math.min(cstart + csize, listEnd.toLong).toInt
            if (cid.length == 4 && (cid.endsWith("dc") || cid.endsWith("db")) &&
                cend > cstart) {
              if (frameIdx % everyN == 0) {
                val img = readImage(
                  java.util.Arrays.copyOfRange(payload, cstart, cend))
                if (img != null) visit(frameIdx, img)
              }
              frameIdx += 1
            }
            val cpad = csize + (csize & 1L)
            p = if (cpad > (listEnd - cstart).toLong) listEnd else cstart + cpad.toInt
          }
        }
        val padded = size + (size & 1L)
        pos = if (padded > (payload.length - start).toLong) payload.length
              else start + padded.toInt
      }
    } catch { case _: Exception => () }
  }

  /** Per-frame perceptual hashes of a video payload — [[dHashImage]] over
    * every `everyN`-th REALLY-decoded frame (animated GIF via the bundled
    * multi-image reader, MJPEG/AVI via the RIFF walk; both dispatch on
    * magic bytes). Empty for undecodable or inter-frame-compressed
    * payloads — those stay queryable through [[mp4Meta]] but cannot hash
    * without a codec.
    */
  def videoFrameHashes(payload: Array[Byte], everyN: Int): Seq[(Int, Long)] = {
    if (payload == null || payload.length < 4) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')
      foreachGifFrame(payload, everyN)((i, img) => out += ((i, dHashImage(img))))
    else
      foreachMjpegFrame(payload, everyN)((i, img) => out += ((i, dHashImage(img))))
    out.toSeq
  }

  /** Distributed per-frame perceptual hashing over the blob table:
    * (id, frame_idx, dhash) — the bounded-memory one-to-many flatMap shape
    * of [[decodeGifFrames]].
    */
  def videoHashes(df: DataFrame, idCol: String, everyN: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        videoFrameHashes(payload, everyN).iterator.map { case (f, h) =>
          (id, f.toLong, h)
        }
      })
      .toDF(idCol, "frame_idx", "dhash")
  }

  /** Video near-duplicate pairs: two videos pair when they sample the SAME
    * frame count and EVERY aligned frame's perceptual hash is within
    * `maxHamming` bits — the strict frame-aligned semantics (a re-encode,
    * brightness shift or rescale pairs; a trim or splice does not).
    * Candidates come from the banded-Hamming pigeonhole join
    * ([[Dedup.hammingNearDups]]'s shape) with `frame_idx` in the bucket
    * key, so only same-position frames ever compare and the plan is never
    * all-pairs; the aggregate then demands all frames matched. Output:
    * (id_a, id_b, n_frames, max_hamming).
    */
  def videoNearDups(
      df: DataFrame,
      idCol: String,
      everyN: Int = 1,
      maxHamming: Int = 3): DataFrame =
    videoNearDupsFromHashes(videoHashes(df, idCol, everyN), idCol, maxHamming)

  /** [[videoNearDups]] over an ALREADY-EXTRACTED (id, frame_idx, dhash)
    * table — the entry point for callers that decoded once for several
    * consumers ([[videoCurationScan]] feeds both this pair join and the
    * quality gate from a single pass) or that read a persisted frame-hash
    * artifact instead of payloads.
    */
  def videoNearDupsFromHashes(
      fhIn: DataFrame,
      idCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, s"maxHamming out of range: $maxHamming")
    val bands = maxHamming + 1
    val width = 64 / bands
    // both join sides and the frame-count table read the hashes: decode once
    val fh = Dedup.materializeOnce(
      fhIn.select(col(idCol), col("frame_idx"), col("dhash")))
    val counts = fh.groupBy(col(idCol)).agg(count(lit(1)).as("__nf"))
    val banded = fh.select(col(idCol), col("frame_idx"), col("dhash"),
      explode(array((0 until bands).map { i =>
        val shifted = shiftrightunsigned(col("dhash"), i * width)
        val bits =
          if (i == bands - 1) shifted
          else shifted.bitwiseAND(lit((1L << width) - 1))
        struct(lit(i).as("band"), bits.as("bits"))
      }: _*)).as("bb"))
      .select(col(idCol), col("frame_idx"), col("dhash"),
        col("bb.band"), col("bb.bits"))
    val a = banded.select(col(idCol).as("id_a"), col("frame_idx"),
      col("dhash").as("__ha"), col("band"), col("bits")).hint("shuffle_hash")
    val b = banded.select(col(idCol).as("id_b"), col("frame_idx"),
      col("dhash").as("__hb"), col("band"), col("bits")).hint("shuffle_hash")
    val framePairs = a.join(b, Seq("frame_idx", "band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming",
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "frame_idx", "hamming")
      .distinct()
    framePairs.groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("__matched"), max(col("hamming")).as("max_hamming"))
      .join(counts.select(col(idCol).as("id_a"), col("__nf").as("__nfa")), "id_a")
      .join(counts.select(col(idCol).as("id_b"), col("__nf").as("__nfb")), "id_b")
      .filter(col("__matched") === col("__nfa") && col("__nfa") === col("__nfb"))
      .select(col("id_a"), col("id_b"), col("__nfa").as("n_frames"),
        col("max_hamming"))
  }

  /** Single-decode video curation scan — the [[imageCurationScan]] shape
    * for multi-frame payloads: ONE container walk per video yields every
    * frame's perceptual hash (for [[videoNearDupsFromHashes]]) AND its
    * integer luma sum + pixel count (for an exact-arithmetic quality
    * score: `Σ luma_sum / Σ n_px` is a ratio of exact integers, immune to
    * float summation order across frames). A payload with no decodable
    * frames emits one all-null row so validity stays visible downstream
    * (report, don't fail). Output: (id, frame_idx, dhash, luma_sum, n_px).
    */
  def videoCurationScan(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val frames = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
        def add(i: Int, img: java.awt.image.BufferedImage): Unit =
          frames += ((id, Some(i.toLong), Some(dHashImage(img)),
            Some(lumaSumOf(img)), Some(img.getWidth.toLong * img.getHeight)))
        if (payload != null && payload.length >= 4 &&
            payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')
          foreachGifFrame(payload, 1)(add)
        else if (payload != null)
          foreachMjpegFrame(payload, 1)(add)
        if (frames.isEmpty) Iterator.single((id, None, None, None, None))
        else frames.iterator
      })
      .toDF(idCol, "frame_idx", "dhash", "luma_sum", "n_px")
  }

  /** Distributed MJPEG/AVI decode over the blob table — one row per sampled
    * frame, the same bounded-memory one-to-many flatMap shape as
    * [[decodeGifFrames]].
    */
  def decodeMjpegFrames(df: DataFrame, idCol: String, everyN: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        mjpegFrames(payload, everyN).iterator.map { case (f, w, h, luma) =>
          (id, f.toLong, w, h, luma)
        }
      })
      .toDF(idCol, "frame_idx", "width", "height", "mean_luma")
  }

  /** Minimal AVI-MJPEG encoder (test/query fixture): canonical RIFF layout
    * — `hdrl` (avih + one `vids/MJPG` stream with its BITMAPINFOHEADER),
    * `movi` with one word-aligned `00dc` JPEG chunk per frame, and an
    * `idx1` keyframe index. Frames are JPEG-encoded by the JDK's own
    * writer; decodable by [[mjpegFrames]] and by stock AVI tooling.
    */
  def encodeMjpegAvi(frames: Seq[java.awt.image.BufferedImage], fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && fps > 0)
    val jpegs = frames.map { f =>
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(f, "jpg", bos)
      bos.toByteArray
    }
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val n = frames.length
    def chunkLen(body: Int): Int = 8 + body + (body & 1)
    val aviHdrLen  = chunkLen(56)                    // avih
    val strlLen    = 4 + chunkLen(56) + chunkLen(40) // 'strl' + strh + strf
    val hdrlLen    = 4 + aviHdrLen + chunkLen(strlLen)
    val moviBody   = 4 + jpegs.map(j => chunkLen(j.length)).sum
    val idx1Body   = 16 * n
    val riffBody   = 4 + chunkLen(hdrlLen) + chunkLen(moviBody) + chunkLen(idx1Body)
    val bb = java.nio.ByteBuffer.allocate(8 + riffBody)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); bb.putInt(riffBody); fourcc("AVI ")
    fourcc("LIST"); bb.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); bb.putInt(56)
    bb.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0x10 /* HASINDEX */)
      .putInt(n).putInt(0).putInt(1).putInt(0).putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(strlLen); fourcc("strl")
    fourcc("strh"); bb.putInt(56)
    fourcc("vids"); fourcc("MJPG")
    bb.putInt(0).putInt(0).putInt(0)          // flags, prio+lang, initialFrames
      .putInt(1).putInt(fps)                  // scale, rate
      .putInt(0).putInt(n).putInt(jpegs.map(_.length).max)
      .putInt(-1).putInt(0)                   // quality, sampleSize
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    fourcc("strf"); bb.putInt(40)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    fourcc("MJPG")
    bb.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); bb.putInt(moviBody); fourcc("movi")
    jpegs.foreach { j =>
      fourcc("00dc"); bb.putInt(j.length); bb.put(j)
      if ((j.length & 1) == 1) bb.put(0.toByte)
    }
    fourcc("idx1"); bb.putInt(idx1Body)
    // idx1 offsets are measured from the 'movi' fourcc position
    var rel = 4
    jpegs.foreach { j =>
      fourcc("00dc"); bb.putInt(0x10); bb.putInt(rel); bb.putInt(j.length)
      rel += chunkLen(j.length)
    }
    bb.array()
  }

  // ------------------------------------------------------------------ audio

  /** Decoded WAV facts: container-level (rate/channels/bits) plus
    * signal-level (frame count, duration, RMS of full-scale-normalized
    * samples across all channels, exact integer sum of squared samples for
    * integer PCM — the cross-engine-reproducible form).
    */
  final case class WavInfo(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      nFrames: Long,
      durationSec: Double,
      rms: Double)

  /** REAL WAV/PCM decode — RIFF chunk walk + sample scan in pure `java.nio`
    * (WAV needs no codec: the container IS the samples). Supports PCM
    * 8-bit unsigned / 16 / 24 / 32-bit signed little-endian and 32-bit IEEE
    * float (format tags 1 and 3). Returns None for anything else (wrong
    * magic, truncated header, extensible/compressed formats).
    *
    * Robustness mirrors the image path's bomb guard: chunk sizes are
    * CLAIMS — every offset is clamped to the real payload length before any
    * read, a data chunk longer than the payload is truncated to the bytes
    * actually present, and the scan streams over the buffer without
    * materializing a sample array, so a forged 4 GB size field cannot
    * allocate anything.
    */
  def decodeWav(payload: Array[Byte]): Option[WavInfo] = {
    if (payload == null || payload.length < 44) return None
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    var pos = 12
    var fmtTag = -1; var channels = 0; var sampleRate = 0; var bits = 0
    var result: Option[WavInfo] = None
    while (result.isEmpty && pos + 8 <= payload.length) {
      val id   = tag(pos)
      val size = bb.getInt(pos + 4).toLong & 0xffffffffL // size field is a claim
      val start = pos + 8
      if (id == "fmt " && size >= 16 && start + 16 <= payload.length) {
        fmtTag     = bb.getShort(start).toInt & 0xffff
        channels   = bb.getShort(start + 2).toInt & 0xffff
        sampleRate = bb.getInt(start + 4)
        bits       = bb.getShort(start + 14).toInt & 0xffff
      } else if (id == "data") {
        if (fmtTag != 1 && fmtTag != 3) return None // fmt missing or not PCM/float
        if (channels <= 0 || sampleRate <= 0) return None
        if (fmtTag == 3 && bits != 32) return None
        if (fmtTag == 1 && bits != 8 && bits != 16 && bits != 24 && bits != 32) return None
        val bytesPerSample = bits / 8
        val blockAlign     = bytesPerSample * channels
        val avail  = math.min(size, (payload.length - start).toLong)
        val usable = avail - avail % blockAlign // whole frames only
        val nSamples = usable / bytesPerSample
        val nFrames  = nSamples / channels
        // stream the samples. For 8/16-bit PCM the sum of squared RAW values
        // is accumulated as an exact Long (v² <= 2^30, no precision loss to
        // ~2^33 samples) and normalized once at the end — so the RMS is
        // bit-reproducible by any engine that can sum integers (the
        // cross-engine oracle recomputes it relationally). Wider formats
        // would overflow the exact path and use double accumulation.
        var sumSqI = 0L
        var sumSqD = 0.0
        val exactPath = fmtTag == 1 && bits <= 16
        var i = 0L
        while (i < nSamples) {
          val off = start + (i * bytesPerSample).toInt
          if (exactPath) {
            val v = if (bits == 8) (payload(off) & 0xff) - 128
                    else bb.getShort(off).toInt
            sumSqI += v.toLong * v
          } else {
            val x: Double = (fmtTag, bits) match {
              case (1, 24) =>
                val v = (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
                  (payload(off + 2) << 16) // top byte keeps its sign
                v / 8388608.0
              case (1, 32) => bb.getInt(off) / 2147483648.0
              case _       => bb.getFloat(off).toDouble
            }
            sumSqD += x * x
          }
          i += 1
        }
        val fullScale = if (bits == 8) 128.0 else 32768.0
        val rms =
          if (nSamples == 0) 0.0
          else if (exactPath) math.sqrt(sumSqI.toDouble / nSamples) / fullScale
          else math.sqrt(sumSqD / nSamples)
        result = Some(WavInfo(sampleRate, channels, bits, nFrames,
          nFrames.toDouble / sampleRate, rms))
      }
      // advance word-aligned; a claimed size past the buffer ends the walk
      val padded = size + (size & 1L)
      pos = if (padded > (payload.length - start).toLong) payload.length
            else start + padded.toInt
    }
    result
  }

  /** Minimal PCM16 mono/stereo WAV encoder (44-byte canonical header) — the
    * generation side for specs and closed-form oracle queries; decodable by
    * any WAV reader including [[decodeWav]] and `javax.sound.sampled`.
    */
  /** Perceptual audio fingerprint — the dHash idea in one dimension: the
    * PCM sample stream is cut into 65 equal-measure windows (sample i →
    * window `i*65/n`, integer floor), each window's EXACT integer energy
    * `Σ v²` accumulated as a Long, and bit `w` set iff
    * `energy(w) > energy(w+1)`. Like the image gradient hash this is
    * invariant to what a re-encode typically changes — uniform GAIN
    * scales every window energy by the same factor and flips no
    * comparison — while structural edits flip the bits their windows
    * touch. PCM 8/16-bit only (the exact-integer path — the same
    * arithmetic any engine reproduces bit-for-bit; float/24/32-bit would
    * need a documented rounding contract); same claims-clamped RIFF
    * discipline as [[decodeWav]]. Returns None for non-WAV payloads,
    * wider formats, or streams shorter than 65 samples.
    */
  def audioFingerprint(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.length < 44) return None
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      var pos = 12
      var fmtTag = -1; var channels = 0; var bits = 0
      while (pos + 8 <= payload.length) {
        val id = tag(pos)
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL // a claim
        val start = pos + 8
        if (id == "fmt " && size >= 16 && start + 16 <= payload.length) {
          fmtTag   = bb.getShort(start).toInt & 0xffff
          channels = bb.getShort(start + 2).toInt & 0xffff
          bits     = bb.getShort(start + 14).toInt & 0xffff
        } else if (id == "data") {
          if (fmtTag != 1 || (bits != 8 && bits != 16) || channels <= 0)
            return None
          val bytesPerSample = bits / 8
          val blockAlign = bytesPerSample * channels
          val avail  = math.min(size, (payload.length - start).toLong)
          val usable = avail - avail % blockAlign
          val n = usable / bytesPerSample
          if (n < 65) return None
          val energy = new Array[Long](65)
          var i = 0L
          while (i < n) {
            val off = start + (i * bytesPerSample).toInt
            val v = if (bits == 8) (payload(off) & 0xff) - 128
                    else bb.getShort(off).toInt
            energy(((i * 65) / n).toInt) += v.toLong * v
            i += 1
          }
          var sig = 0L
          var w = 0
          while (w < 64) {
            if (energy(w) > energy(w + 1)) sig |= 1L << w
            w += 1
          }
          return Some(sig)
        }
        val padded = size + (size & 1L)
        pos =
          if (padded > (payload.length - start).toLong) payload.length
          else start + padded.toInt
      }
      None
    } catch { case _: Exception => None }
  }

  /** Distributed audio fingerprinting: (id, afp), null for payloads the
    * exact path cannot hash — the [[imageHashes]] shape for audio.
    */
  def audioFingerprints(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, audioFingerprint(p)) })
      .toDF(idCol, "afp")
  }

  /** Single-pass audio curation scan: one task visit per payload yields
    * the perceptual dedup signature ([[audioFingerprint]]) AND the
    * quality/metadata signals ([[decodeWav]]'s RMS + duration) — the
    * [[imageCurationScan]] shape for audio. Both extractors are
    * claims-clamped `java.nio` walks over the same in-memory byte array
    * (WAV needs no codec), so "one pass" here means one payload fetch and
    * one task, not a shared sample loop. A payload the fingerprint path
    * cannot hash (non-WAV, float/24/32-bit formats, <65 samples) still
    * reports whatever [[decodeWav]] recovers; fully undecodable rows are
    * all-null (report, don't fail).
    */
  def audioCurationScan(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val info = decodeWav(p)
        (id, audioFingerprint(p), info.map(_.rms), info.map(_.durationSec))
      })
      .toDF(idCol, "afp", "rms", "duration_s")
  }

  /** Audio near-duplicate pairs within `maxHamming` fingerprint bits —
    * [[audioFingerprint]] through the shared banded-Hamming machinery
    * ([[Dedup.hammingNearDups]]), completing near-dup coverage across the
    * modalities (text SimHash, embedding SemDeDup, image/video dHash,
    * audio energy-gradient). A volume change pairs at hamming 0; a
    * structural edit does not.
    */
  def audioNearDups(df: DataFrame, idCol: String, maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDups(
      audioFingerprints(df, idCol).filter(col("afp").isNotNull),
      idCol, "afp", maxHamming)

  def encodeWavPcm16(samples: Array[Short], sampleRate: Int, channels: Int = 1): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Distributed REAL audio decode over the blob table: container + signal
    * columns from actual WAV bytes (nulls for undecodable payloads — report,
    * don't fail). Same bounded-memory mapPartitions shape as
    * [[decodeImages]]: one payload streams through at a time per task.
    */
  def decodeAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        decodeWav(payload) match {
          case Some(w) => (id, Some(w.sampleRate), Some(w.channels),
            Some(w.bitsPerSample), Some(w.nFrames), Some(w.durationSec), Some(w.rms))
          case None => (id, None, None, None, None, None, None)
        }
      })
      .toDF(idCol, "sample_rate", "channels", "bits", "n_frames", "duration_s", "rms")
  }

  // --------------------------------------------- video containers (ISO-BMFF)

  /** Parsed MP4/ISO-BMFF container facts: ftyp major brand, presentation
    * duration in milliseconds (mvhd; for FRAGMENTED movies — mvhd
    * duration 0, the dominant DASH/web layout — the mvex/mehd whole-movie
    * duration), track count, the first video track's sample-entry codec
    * fourcc + tkhd dimensions, the first audio track's codec fourcc, and
    * the top-level `moof` fragment count (0 for a plain progressive file).
    */
  final case class Mp4Info(
      brand: String,
      durationMs: Double,
      nTracks: Int,
      videoCodec: Option[String],
      width: Option[Int],
      height: Option[Int],
      audioCodec: Option[String],
      nFragments: Int,
      videoProfile: Option[String] = None,
      videoLevel: Option[Int] = None,
      videoBitDepth: Option[Int] = None)

  /** AVC profile_idc → the published profile name (ISO/IEC 14496-10
    * Annex A); unknown values keep the numeric form so nothing is lost.
    */
  def avcProfileName(p: Int): String = p match {
    case 66  => "baseline"
    case 77  => "main"
    case 88  => "extended"
    case 100 => "high"
    case 110 => "high10"
    case 122 => "high422"
    case 244 => "high444"
    case _   => s"avc$p"
  }

  /** HEVC general_profile_idc → name (ISO/IEC 23008-2 Annex A). */
  def hevcProfileName(p: Int): String = p match {
    case 1 => "main"
    case 2 => "main10"
    case 3 => "mainstill"
    case 4 => "rext"
    case _ => s"hevc$p"
  }

  /** MP4/ISO-BMFF container parse WITHOUT frame decode — the atom walk
    * (ftyp → moov → mvhd / trak → tkhd / mdia → hdlr / minf → stbl → stsd)
    * that makes compressed-video payloads (H.264/HEVC/VP9/AV1 in MP4)
    * queryable by duration, track layout, codec and resolution even though
    * no JDK codec exists to decode their FRAMES ([[stubDecode]] remains the
    * documented placeholder for pixel-level work). This is the curation
    * reality at scale: filtering a crawl by "video longer than 30 s,
    * ≥720p, avc1" needs exactly these fields and none of the pixels.
    *
    * Same `java.nio` discipline as [[decodeWav]]/[[mjpegFrames]], big-endian
    * per the ISO spec: every size field is a CLAIM clamped to the real
    * payload bounds, 64-bit `largesize` (size==1) and to-end (size==0)
    * boxes are honored, a corrupt child list stops cleanly at the last
    * well-formed box, and nothing is allocated proportional to any claimed
    * size — a forged 4 GB box cannot OOM a task. Returns None when the
    * payload has no `ftyp`+`moov` (not ISO-BMFF).
    */
  def mp4Meta(payload: Array[Byte]): Option[Mp4Info] = {
    if (payload == null || payload.length < 16) return None
    val bb = java.nio.ByteBuffer.wrap(payload) // ISO-BMFF is big-endian
    def tag(off: Int): String =
      new String(payload, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // child boxes of [start, end): (fourcc, bodyStart, boxEnd), size claims
    // clamped; a malformed header ends the list rather than throwing
    def children(start: Int, end: Int): List[(String, Int, Int)] = {
      val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
      var pos = start
      var ok = true
      while (ok && pos + 8 <= end) {
        val size32 = bb.getInt(pos).toLong & 0xffffffffL
        val name = tag(pos + 4)
        var bodyStart = pos + 8
        val boxLen =
          if (size32 == 0L) (end - pos).toLong // last box: extends to end
          else if (size32 == 1L) {             // 64-bit largesize
            if (pos + 16 > end) { ok = false; 0L }
            else { bodyStart = pos + 16; bb.getLong(pos + 8) }
          } else size32
        if (ok && boxLen >= (bodyStart - pos).toLong) {
          val boxEnd = math.min(pos.toLong + boxLen, end.toLong).toInt
          out += ((name, bodyStart, boxEnd))
          pos = boxEnd
        } else ok = false
      }
      out.toList
    }
    try {
      val top = children(0, payload.length)
      val brand = top.find(_._1 == "ftyp").collect {
        case (_, s, e) if s + 4 <= e => tag(s)
      }
      val moov = top.find(_._1 == "moov")
      if (brand.isEmpty || moov.isEmpty) return None
      val moovKids = children(moov.get._2, moov.get._3)
      val mvhd = moovKids.find(_._1 == "mvhd").map { case (_, s, e) =>
        val ver = if (s < e) payload(s) & 0xff else 0
        if (ver == 1 && s + 32 <= e) { // 64-bit creation/modification/duration
          val ts = bb.getInt(s + 20).toLong & 0xffffffffL
          (ts, bb.getLong(s + 24))
        } else if (ver == 0 && s + 24 <= e) {
          val ts = bb.getInt(s + 12).toLong & 0xffffffffL
          (ts, bb.getInt(s + 16).toLong & 0xffffffffL)
        } else (0L, 0L)
      }.getOrElse((0L, 0L))
      // fragmented MP4 (the dominant web/DASH layout): mvhd's duration is
      // 0 because the samples live in moof fragments; the whole-movie
      // duration then comes from mvex/mehd (fragment_duration, same
      // movie timescale). Fragment count = top-level moof boxes.
      val mehdDuration = (for {
        (_, vs, ve) <- moovKids.find(_._1 == "mvex")
        (_, ms, me) <- children(vs, ve).find(_._1 == "mehd")
      } yield {
        val ver = if (ms < me) payload(ms) & 0xff else 0
        if (ver == 1 && ms + 12 <= me) bb.getLong(ms + 4)
        else if (ver == 0 && ms + 8 <= me) bb.getInt(ms + 4).toLong & 0xffffffffL
        else 0L
      }).getOrElse(0L)
      val durTicks = if (mvhd._2 > 0) mvhd._2 else mehdDuration
      val durationMs =
        if (mvhd._1 > 0) durTicks * 1000.0 / mvhd._1 else 0.0
      val nFragments = top.count(_._1 == "moof")
      val traks = moovKids.filter(_._1 == "trak")
      var videoCodec: Option[String] = None
      var width: Option[Int] = None
      var height: Option[Int] = None
      var audioCodec: Option[String] = None
      var videoProfile: Option[String] = None
      var videoLevel: Option[Int] = None
      var videoBitDepth: Option[Int] = None
      // AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.3.3): profile
      // and level sit at fixed offsets; bit depth lives in the profile
      // EXTENSION after the variable-length SPS/PPS arrays, present only
      // for the high-family profiles — walked with every length claim
      // bounds-checked, a truncated record yields None, never a throw
      def parseAvcC(s: Int, e: Int): (Option[String], Option[Int], Option[Int]) = {
        if (s + 4 > e) return (None, None, None)
        val profile = payload(s + 1) & 0xff
        val level = payload(s + 3) & 0xff
        val highFamily =
          profile == 100 || profile == 110 || profile == 122 ||
          profile == 144 || profile == 244
        val bitDepth =
          if (!highFamily) Some(8) // pre-high profiles are 8-bit by spec
          else {
            var p = s + 5
            var ok = p < e
            if (ok) {
              val nSps = payload(p) & 0x1f; p += 1
              var i = 0
              while (ok && i < nSps) {
                if (p + 2 > e) ok = false
                else { p += 2 + (bb.getShort(p) & 0xffff); if (p > e) ok = false }
                i += 1
              }
              if (ok && p < e) {
                val nPps = payload(p) & 0xff; p += 1
                var j = 0
                while (ok && j < nPps) {
                  if (p + 2 > e) ok = false
                  else { p += 2 + (bb.getShort(p) & 0xffff); if (p > e) ok = false }
                  j += 1
                }
              } else ok = false
            }
            // extension: [0] chroma_format, [1] bit_depth_luma_minus8
            if (ok && p + 2 <= e) Some((payload(p + 1) & 0x7) + 8) else None
          }
        (Some(avcProfileName(profile)), Some(level), bitDepth)
      }
      // HEVCDecoderConfigurationRecord (ISO/IEC 14496-15 §8.3.3.1): all
      // three facts sit at fixed offsets before the NAL arrays
      def parseHvcC(s: Int, e: Int): (Option[String], Option[Int], Option[Int]) = {
        if (s + 13 > e) return (None, None, None)
        val profile = payload(s + 1) & 0x1f
        val level = payload(s + 12) & 0xff
        val bitDepth = if (s + 18 <= e) Some((payload(s + 17) & 0x7) + 8) else None
        (Some(hevcProfileName(profile)), Some(level), bitDepth)
      }
      traks.foreach { case (_, ts0, te0) =>
        val tk = children(ts0, te0)
        val mdia = tk.find(_._1 == "mdia")
          .map { case (_, s, e) => children(s, e) }.getOrElse(Nil)
        val handler = mdia.find(_._1 == "hdlr").collect {
          case (_, s, e) if s + 12 <= e => tag(s + 8)
        }
        // stsd's first sample entry carries the codec fourcc; its box
        // bounds (size claim clamped to the stsd body) delimit the
        // codec-private child boxes (avcC/hvcC) after the 86-byte
        // VisualSampleEntry header
        val entry = for {
          (_, mis, mie) <- mdia.find(_._1 == "minf")
          (_, sts, ste) <- children(mis, mie).find(_._1 == "stbl")
          (_, sds, sde) <- children(sts, ste).find(_._1 == "stsd")
          if sds + 16 <= sde // ver/flags + entry_count + first entry header
        } yield {
          val es = sds + 8
          val claimed = bb.getInt(es).toLong & 0xffffffffL
          (tag(sds + 12), es, math.min(es + claimed, sde.toLong).toInt)
        }
        handler match {
          case Some("vide") if videoCodec.isEmpty =>
            videoCodec = entry.map(_._1)
            entry.foreach { case (_, es, ee) =>
              if (es + 86 < ee)
                children(es + 86, ee).collectFirst {
                  case ("avcC", cs, ce) => parseAvcC(cs, ce)
                  case ("hvcC", cs, ce) => parseHvcC(cs, ce)
                }.foreach { case (p, l, b) =>
                  videoProfile = p; videoLevel = l; videoBitDepth = b
                }
            }
            tk.find(_._1 == "tkhd").foreach { case (_, s, e) =>
              val ver = if (s < e) payload(s) & 0xff else 0
              // 16.16 fixed-point dims are the last 8 body bytes
              val wOff = if (ver == 1) s + 88 else s + 76
              if (wOff + 8 <= e) {
                width = Some(bb.getInt(wOff) >>> 16)
                height = Some(bb.getInt(wOff + 4) >>> 16)
              }
            }
          case Some("soun") if audioCodec.isEmpty => audioCodec = entry.map(_._1)
          case _ => ()
        }
      }
      Some(Mp4Info(brand.get, durationMs, traks.size,
        videoCodec, width, height, audioCodec, nFragments,
        videoProfile, videoLevel, videoBitDepth))
    } catch { case _: Exception => None }
  }

  /** Distributed container-metadata extraction over the blob table — one
    * row per payload with NULLs for non-ISO-BMFF bytes; the same
    * bounded-memory mapPartitions shape as [[decodeAudio]]. Pixel decode is
    * deliberately absent: this pass reads only the moov header atoms, so it
    * scans a 100 TB video corpus at parquet speed.
    */
  def videoContainerMeta(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        mp4Meta(p) match {
          case Some(m) => (id, Some(m.brand), Some(m.durationMs),
            Some(m.nTracks), m.videoCodec, m.width, m.height, m.audioCodec,
            Some(m.nFragments), m.videoProfile, m.videoLevel, m.videoBitDepth)
          case None => (id, None, None, None, None, None, None, None, None,
            None, None, None)
        }
      })
      .toDF(idCol, "brand", "duration_ms", "n_tracks", "video_codec",
        "width", "height", "audio_codec", "n_fragments",
        "video_profile", "video_level", "bit_depth")
  }

  /** One track of the [[encodeMp4Container]] fixture twin. `handler` is the
    * ISO handler type (`vide`/`soun`), `codec` the sample-entry fourcc
    * (`avc1`, `hvc1`, `vp09`, `av01`, `mp4a`, …). `profile`/`level`/
    * `bitDepth` > 0 add the matching codec-private box (`avcC` for avc1,
    * `hvcC` for hvc1/hev1) inside the sample entry — the decoder-config
    * record a real muxer always writes and [[mp4Meta]] reads back.
    */
  final case class Mp4Track(handler: String, codec: String, width: Int, height: Int,
      profile: Int = 0, level: Int = 0, bitDepth: Int = 8)

  /** Minimal ISO-BMFF writer (test/query fixture — the [[mp4Meta]] encode
    * twin, like [[encodeWavPcm16]]/[[encodeMjpegAvi]] for their decoders):
    * canonical `ftyp` + `moov`(`mvhd` + per-track `trak`(`tkhd` +
    * `mdia`(`mdhd`/`hdlr`/`minf`(`vmhd`|`smhd` + `stbl` with an `stsd`
    * sample entry and empty `stts`/`stsc`/`stsz`/`stco` tables))) + an empty
    * `mdat`. With `fragments > 0` it writes the FRAGMENTED layout instead:
    * mvhd duration 0, `mvex`(`mehd` whole-movie duration + one `trex` per
    * track) inside moov, and that many `moof`(`mfhd`)+`mdat` pairs after
    * it. Structurally valid per ISO/IEC 14496-12 (parseable by stock
    * MP4 tooling); carries no media samples — the fixture for a
    * header-only parser needs headers, not frames.
    */
  def encodeMp4Container(
      brand: String,
      timescale: Int,
      durationTicks: Long,
      tracks: Seq[Mp4Track],
      fragments: Int = 0): Array[Byte] = {
    require(brand.length == 4 && timescale > 0 && tracks.nonEmpty)
    require(tracks.forall(t => t.handler.length == 4 && t.codec.length == 4))
    require(fragments >= 0)
    // fragmented layout: samples live in moof boxes, so mvhd's duration is
    // 0 and the whole-movie duration moves to mvex/mehd — exactly the
    // DASH/web shape mp4Meta's fallback reads
    val fragmented = fragments > 0
    def bytes(n: Int)(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n); f(b); b.array()
    }
    def box(name: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(len)
      b.putInt(len).put(name.getBytes("US-ASCII"))
      body.foreach(b.put)
      b.array()
    }
    def full(name: String, verFlags: Int, body: Array[Byte]): Array[Byte] =
      box(name, bytes(4)(_.putInt(verFlags)), body)
    val unityMatrix = bytes(36) { b =>
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
    }
    val ftyp = box("ftyp", bytes(16) { b =>
      b.put(brand.getBytes("US-ASCII")).putInt(0)
      b.put(brand.getBytes("US-ASCII")).put("isom".getBytes("US-ASCII"))
    })
    val mvhd = full("mvhd", 0, bytes(96) { b =>
      b.putInt(0).putInt(0)                      // creation, modification
      b.putInt(timescale).putInt(if (fragmented) 0 else durationTicks.toInt)
      b.putInt(0x00010000)                       // rate 1.0
      b.putShort(0x0100.toShort).putShort(0)     // volume 1.0, reserved
      b.putLong(0L)                              // reserved
      b.put(unityMatrix)
      b.put(new Array[Byte](24))                 // pre_defined
      b.putInt(tracks.size + 1)                  // next_track_ID
    })
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val isVideo = t.handler == "vide"
      val tkhd = full("tkhd", 3, bytes(80) { b => // flags: enabled | in movie
        b.putInt(0).putInt(0).putInt(i + 1).putInt(0)
        b.putInt(durationTicks.toInt)
        b.putLong(0L)                            // reserved
        b.putShort(0).putShort(0)                // layer, alternate_group
        b.putShort(if (isVideo) 0 else 0x0100.toShort).putShort(0)
        b.put(unityMatrix)
        b.putInt(t.width << 16).putInt(t.height << 16) // 16.16 fixed
      })
      val mdhd = full("mdhd", 0, bytes(20) { b =>
        b.putInt(0).putInt(0).putInt(timescale).putInt(durationTicks.toInt)
        b.putShort(0x55c4.toShort).putShort(0)   // language "und"
      })
      val hdlr = full("hdlr", 0, bytes(21) { b =>
        b.putInt(0).put(t.handler.getBytes("US-ASCII"))
        b.put(new Array[Byte](12)).put(0.toByte) // reserved + empty name
      })
      // codec-private decoder-config record for the compressed codecs
      // (the box a real muxer always writes after the visual header)
      val codecPriv: Array[Byte] =
        if (!isVideo || t.profile <= 0) Array.emptyByteArray
        else if (t.codec == "avc1") {
          val high = Seq(100, 110, 122, 144, 244).contains(t.profile)
          box("avcC", bytes(if (high) 11 else 7) { b =>
            b.put(1.toByte).put(t.profile.toByte)  // version, profile_idc
            b.put(0.toByte).put(t.level.toByte)    // compat, level_idc
            b.put(0xFF.toByte)                     // '111111' + lengthSize 3
            b.put(0xE0.toByte).put(0.toByte)       // 0 SPS, 0 PPS
            if (high) {                            // profile extension
              b.put(0xFD.toByte)                   // chroma 4:2:0
              b.put((0xF8 | (t.bitDepth - 8)).toByte)
              b.put((0xF8 | (t.bitDepth - 8)).toByte)
              b.put(0.toByte)                      // 0 SPS-ext
            }
          })
        } else if (t.codec == "hvc1" || t.codec == "hev1") {
          box("hvcC", bytes(23) { b =>
            b.put(1.toByte).put(t.profile.toByte)  // version, space/tier/idc
            b.putInt(0)                            // profile compat flags
            b.put(new Array[Byte](6))              // constraint flags
            b.put(t.level.toByte)
            b.putShort(0xF000.toShort)             // min_spatial_segmentation
            b.put(0xFC.toByte)                     // parallelismType
            b.put(0xFD.toByte)                     // chroma 4:2:0
            b.put((0xF8 | (t.bitDepth - 8)).toByte)
            b.put((0xF8 | (t.bitDepth - 8)).toByte)
            b.putShort(0)                          // avgFrameRate
            b.put(0x03.toByte).put(0.toByte)       // lengthSize 3, 0 arrays
          })
        } else Array.emptyByteArray
      val entry =
        if (isVideo) bytes(86) { b =>            // VisualSampleEntry
          b.putInt(86 + codecPriv.length).put(t.codec.getBytes("US-ASCII"))
          b.put(new Array[Byte](6)).putShort(1)  // reserved, data_ref_index
          b.put(new Array[Byte](16))             // pre_defined/reserved
          b.putShort(t.width.toShort).putShort(t.height.toShort)
          b.putInt(0x00480000).putInt(0x00480000) // 72 dpi
          b.putInt(0).putShort(1)                // reserved, frame_count
          b.put(new Array[Byte](32))             // compressorname
          b.putShort(24).putShort(-1)            // depth, pre_defined
        } ++ codecPriv
        else bytes(36) { b =>                    // AudioSampleEntry
          b.putInt(36).put(t.codec.getBytes("US-ASCII"))
          b.put(new Array[Byte](6)).putShort(1)
          b.putLong(0L)                          // reserved
          b.putShort(2).putShort(16).putInt(0)   // channels, samplesize
          b.putInt(timescale << 16)              // samplerate 16.16
        }
      val stbl = box("stbl",
        full("stsd", 0, bytes(4)(_.putInt(1)) ++ entry),
        full("stts", 0, bytes(4)(_.putInt(0))),
        full("stsc", 0, bytes(4)(_.putInt(0))),
        full("stsz", 0, bytes(8)(_.putInt(0).putInt(0))),
        full("stco", 0, bytes(4)(_.putInt(0))))
      val mediaHdr =
        if (isVideo) full("vmhd", 1, bytes(8)(_.putShort(0).putShort(0).putInt(0)))
        else full("smhd", 0, bytes(4)(_.putShort(0).putShort(0)))
      box("trak", tkhd, box("mdia", mdhd, hdlr, box("minf", mediaHdr, stbl)))
    }
    val moov =
      if (!fragmented) box("moov", (mvhd +: traks): _*)
      else {
        val mehd = full("mehd", 0, bytes(4)(_.putInt(durationTicks.toInt)))
        val trexes = tracks.indices.map { i =>
          full("trex", 0, bytes(20) { b =>
            b.putInt(i + 1).putInt(1)            // track_ID, default stsd idx
            b.putInt(0).putInt(0).putInt(0)      // default duration/size/flags
          })
        }
        box("moov", (mvhd +: traks) :+ box("mvex", (mehd +: trexes): _*): _*)
      }
    val moofs = (1 to fragments).map { seq =>
      box("moof", full("mfhd", 0, bytes(4)(_.putInt(seq)))) ++ box("mdat")
    }
    ftyp ++ moov ++ (if (fragmented) moofs.reduce(_ ++ _) else box("mdat"))
  }

  /** Metadata-only summary — demonstrates payload-free column pruning. */
  def metaSummary(df: DataFrame): DataFrame =
    df.groupBy(col("meta.modality").as("modality"), col("meta.format").as("format"))
      .agg(count(lit(1)).as("n"),
           sum(col("meta.n_bytes")).as("total_bytes"),
           max(col("meta.n_bytes")).as("max_bytes"))
}

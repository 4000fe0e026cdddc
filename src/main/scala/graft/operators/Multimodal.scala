package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Multimodal column plumbing [EXT, north star]: media (image/audio/video)
  * travels the lake as an opaque `binary` column plus a typed metadata
  * struct. Decode / feature-extraction runs as a *partition-local* typed
  * transformation (`mapPartitions`) so a real decoder would amortize its
  * native-library setup once per partition, not once per row, and batch
  * size = partition size is controlled by the usual split knobs
  * (`spark.sql.files.maxPartitionBytes`).
  *
  * The decoder parses REAL PNG headers (pure-JVM byte reader — see
  * [[pngHeader]]); payloads in no recognized format fall back to a
  * deterministic arithmetic stub, which is also the oracle twin for the
  * synthetic text-byte corpus. Everything Spark-side is real either
  * way: the binary schema, the typed Dataset boundary, the
  * per-partition batching shape, and the metadata contract a
  * downstream pipeline would join against.
  */
object Multimodal {

  /** A media blob as stored in the lake. */
  final case class MediaBlob(doc_id: Long, blob: Array[Byte])

  /** Decoded media metadata (what a real image decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** Stub decode: deterministic pure-arithmetic stand-in for a media
    * header parse — the oracle twin for payloads in no real format.
    * Byte-length driven so the DuckDB oracle can replicate it
    * (`octet_length`), which keeps the *plumbing* on the verify path
    * for arbitrary payloads.
    */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.blob.length
    // long arithmetic: n * 7 overflows Int for blobs > ~306 MB, and the
    // oracle computes in BIGINT
    MediaMeta(b.doc_id, n, n % 1024, (n.toLong * 7 % 768).toInt, n % 30 + 1)
  }

  /** The 8-byte PNG signature (ISO 15948 §5.2 / RFC 2083 §3.1). A text
    * or other non-PNG payload can never start with it (0x89 is not
    * valid UTF-8 lead-byte territory for printable text), which is what
    * makes the decode dispatch deterministic.
    */
  private val PngSignature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse a REAL PNG header — pure-JVM byte reading, no image library:
    * after the signature, the first chunk must be IHDR with a 13-byte
    * body `width(4) height(4) bitDepth(1) colorType(1) compression(1)
    * filter(1) interlace(1)`, all big-endian (ISO 15948 §11.2.2).
    * Returns (width, height, bitDepth, colorType), or None when the
    * payload is not a well-formed PNG prefix.
    */
  def pngHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 33) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSignature(i)) return None; i += 1 }
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (be32(8) != 13L) return None // IHDR body is exactly 13 bytes
    if (bytes(12) != 'I' || bytes(13) != 'H' || bytes(14) != 'D' || bytes(15) != 'R')
      return None
    val w = be32(16)
    val h = be32(20)
    // spec range: 1 .. 2^31-1
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some((w.toInt, h.toInt, bytes(24) & 0xff, bytes(25) & 0xff))
  }

  /** Parse a REAL JPEG header — pure-JVM marker scan, no image library:
    * after the SOI marker (FFD8), walk the segment stream (each segment
    * is FF <type> + 2-byte big-endian length INCLUDING the length field,
    * ITU-T T.81 §B.1.1.4) until a start-of-frame marker SOFn
    * (C0–CF minus C4/C8/CC, §B.2.2), whose body is
    * `precision(1) height(2) width(2) nComponents(1)`. Returns
    * (width, height, nComponents), or None when the payload is not a
    * well-formed JPEG prefix (truncated stream, zero dimension, or
    * scan data reached without a frame header).
    */
  def jpegHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def be16(o: Int): Int = (u8(o) << 8) | u8(o + 1)
    if (bytes.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(i) != 0xff) return None // marker misalignment: not a JPEG
      var m = u8(i + 1)
      // fill bytes: FF may pad before a marker (§B.1.1.2)
      while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) }
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
        i += 2 // standalone markers have no length field
      } else if (m == 0xd9 || m == 0xda) {
        return None // EOI / start-of-scan before any SOF: no frame header
      } else {
        if (i + 3 >= bytes.length) return None
        val len = be16(i + 2)
        if (len < 2) return None
        val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (sof) {
          if (len < 8 || i + 9 >= bytes.length) return None
          val h = be16(i + 5)
          val w = be16(i + 7)
          val nc = u8(i + 9)
          return if (w < 1 || h < 1) None else Some((w, h, nc))
        }
        i += 2 + len
      }
    }
    None
  }

  /** Parse a REAL GIF header — the Logical Screen Descriptor directly
    * after the `GIF87a`/`GIF89a` signature carries
    * `width(2) height(2)` LITTLE-endian (GIF89a spec §18). Returns
    * (width, height, version 87|89), or None when the payload is not a
    * well-formed GIF prefix.
    */
  def gifHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    if (bytes.length < 10) return None
    if (bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != '8')
      return None
    val version = bytes(4) match {
      case '7' => 87
      case '9' => 89
      case _ => return None
    }
    if (bytes(5) != 'a') return None
    val w = u8(6) | (u8(7) << 8)
    val h = u8(8) | (u8(9) << 8)
    if (w < 1 || h < 1) None else Some((w, h, version))
  }

  /** Per-blob decode dispatch: a real format header wins (PNG, JPEG and
    * GIF today — one ~30-line parser per additional container); anything
    * else falls back to the deterministic stub, which keeps the DuckDB
    * oracle exact for the synthetic text-byte corpus while real image
    * bytes decode to their true dimensions (MultimodalSpec pins all
    * the paths).
    */
  def decodeOne(b: MediaBlob): MediaMeta = pngHeader(b.blob) match {
    case Some((w, h, _, _)) => MediaMeta(b.doc_id, b.blob.length, w, h, 1)
    case None => jpegHeader(b.blob) match {
      case Some((w, h, _)) => MediaMeta(b.doc_id, b.blob.length, w, h, 1)
      case None => gifHeader(b.blob) match {
        case Some((w, h, _)) => MediaMeta(b.doc_id, b.blob.length, w, h, 1)
        case None => decodeStub(b)
      }
    }
  }

  /** The decode operator: binary blobs → typed metadata, batched per
    * partition. This is where a real pipeline would call into the native
    * decoder with the partition's blobs as one batch.
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeOne))
  }

  // q31 — the full multimodal path: text → utf-8 binary "media" column →
  // partition-local decode → typed metadata, verified against the
  // byte-length arithmetic in SQL.
  val q31MultimodalDecode: QueryDef = QueryDef.sql(
    "q31_multimodal_decode",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST(octet_length(encode(text)) % 1024 AS INTEGER) AS width,
      |  CAST(octet_length(encode(text)) * 7 % 768 AS INTEGER) AS height,
      |  CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    decode(blobs).toDF().orderBy("doc_id")
  }

  /** Resize target preserving aspect ratio, longest side capped. */
  final case class ResizeSpec(
      doc_id: Long, width: Int, height: Int, target_w: Int, target_h: Int)

  /** Aspect-preserving resize to a 256-px longest side — pure integer
    * arithmetic on the decoded dims, partition-local (a real resampler
    * would run here against the decoded pixel buffer).
    */
  def resize(meta: Dataset[MediaMeta], maxSide: Int = 256): Dataset[ResizeSpec] = {
    import meta.sparkSession.implicits._
    meta.mapPartitions(_.map { m =>
      val longest = math.max(math.max(m.width, m.height), 1)
      if (longest <= maxSide) ResizeSpec(m.doc_id, m.width, m.height, m.width, m.height)
      else ResizeSpec(m.doc_id, m.width, m.height,
        m.width * maxSide / longest, m.height * maxSide / longest)
    })
  }

  // q59 — decode → resize chained partition-local: no shuffle anywhere,
  // the whole media pipeline is one narrow stage per file split.
  val q59MediaResize: QueryDef = QueryDef.sql(
    "q59_media_resize",
    """WITH m AS (SELECT doc_id,
      |                  CAST(octet_length(encode(text)) % 1024 AS INTEGER) AS width,
      |                  CAST(octet_length(encode(text)) * 7 % 768 AS INTEGER) AS height
      |           FROM documents),
      |s AS (SELECT *, CASE WHEN width > height THEN width ELSE height END AS longest0 FROM m),
      |t AS (SELECT doc_id, width, height,
      |             CASE WHEN longest0 < 1 THEN 1 ELSE longest0 END AS longest FROM s)
      |SELECT doc_id, width, height,
      |       CAST(CASE WHEN longest <= 256 THEN width  ELSE width  * 256 // longest END AS INTEGER) AS target_w,
      |       CAST(CASE WHEN longest <= 256 THEN height ELSE height * 256 // longest END AS INTEGER) AS target_h
      |FROM t
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    resize(decode(blobs)).toDF().orderBy("doc_id")
  }

  /** One sampled frame of a media blob. */
  final case class FrameSample(doc_id: Long, frame_idx: Int)

  /** Even frame sampling: at most 8 frames, every ceil(n/8)-th index —
    * the video analog of image resize (a real pipeline seeks these frame
    * offsets in the container).
    */
  def sampleFrames(meta: Dataset[MediaMeta], maxFrames: Int = 8): Dataset[FrameSample] = {
    import meta.sparkSession.implicits._
    meta.flatMap { m =>
      val step = (m.n_frames + maxFrames - 1) / maxFrames
      (0 until m.n_frames).filter(_ % step == 0).map(i => FrameSample(m.doc_id, i))
    }
  }

  // q60 — frame sampling as a typed flatMap (generator shape): metadata
  // row → ≤8 frame rows, still shuffle-free.
  val q60FrameSample: QueryDef = QueryDef.sql(
    "q60_frame_sample",
    """WITH m AS (SELECT doc_id,
      |                  CAST(octet_length(encode(text)) % 30 + 1 AS INTEGER) AS n_frames
      |           FROM documents),
      |st AS (SELECT doc_id, n_frames, (n_frames + 7) // 8 AS step FROM m)
      |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx
      |FROM st, generate_series(0, 29) g(i)
      |WHERE i < n_frames AND i % step = 0
      |ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    sampleFrames(decode(blobs)).toDF().orderBy("doc_id", "frame_idx")
  }

  /** Fixed-size feature vector extracted from the raw payload. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Int, avg_byte: Double, min_byte: Int, max_byte: Int,
      checksum: Long)

  /** Shared feature-window bound: both the Spark byte walk and the DuckDB
    * oracle's generate_series stop here, so the two can never silently
    * diverge on a long payload (the q22/q53 shared-cap pattern). 64 KiB is
    * the natural shape for a media featurizer — real extractors read a
    * bounded header/window, not the whole blob.
    */
  val FeatureWindowBytes: Int = 65536

  /** Byte-level feature extraction (the stand-in for an embedding model):
    * one pass over the first [[FeatureWindowBytes]] of the payload per
    * row, partition-local. The checksum is position-weighted so it is
    * order-sensitive like a real content hash.
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val bytes = b.blob
      var sum = 0L; var mn = 255; var mx = 0; var ck = 0L
      var i = 0
      val end = math.min(bytes.length, FeatureWindowBytes)
      while (i < end) {
        val v = bytes(i) & 0xff
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        ck = (ck + (i + 1).toLong * v) % 1000003L
        i += 1
      }
      val n = end
      MediaFeatures(b.doc_id, n, if (n == 0) 0.0 else sum.toDouble / n,
        if (n == 0) 0 else mn, if (n == 0) 0 else mx, ck)
    })
  }

  // q61 — feature extraction verified byte-for-byte: the documents are
  // ASCII, so DuckDB's per-char unicode() equals the Spark-side byte walk
  // (pinned by the n_bytes = length check the oracle's join implies).
  // The 65536 series bound is FeatureWindowBytes — the shared engine/
  // oracle cap (generate_series only accepts constants, so it cannot be
  // length-driven; keeping one named constant on both sides is the same
  // invariant discipline as q22/q53's 4002-token cap).
  val q61MediaFeatures: QueryDef = QueryDef.sql(
    "q61_media_features",
    """WITH u AS (SELECT doc_id, i, unicode(substr(text, CAST(i AS INTEGER), 1)) AS b
      |           FROM documents, generate_series(1, 65536) g(i)
      |           WHERE i <= length(text)),
      |f AS (SELECT doc_id,
      |             COUNT(*) AS n,
      |             SUM(b) AS sum_b, MIN(b) AS min_b, MAX(b) AS max_b,
      |             SUM(i * b) % 1000003 AS ck
      |      FROM u GROUP BY 1)
      |SELECT d.doc_id,
      |       CAST(COALESCE(f.n, 0) AS INTEGER) AS n_bytes,
      |       CASE WHEN f.n IS NULL THEN 0.0 ELSE CAST(f.sum_b AS DOUBLE) / f.n END AS avg_byte,
      |       CAST(COALESCE(f.min_b, 0) AS INTEGER) AS min_byte,
      |       CAST(COALESCE(f.max_b, 0) AS INTEGER) AS max_byte,
      |       CAST(COALESCE(f.ck % 1000003, 0) AS BIGINT) AS checksum
      |FROM documents d LEFT JOIN f ON d.doc_id = f.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    extractFeatures(blobs).toDF().orderBy("doc_id")
  }

  /** Decoded audio metadata (what a real audio decoder would emit). */
  final case class AudioMeta(
      doc_id: Long, n_bytes: Int, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long)

  /** Parse a REAL WAV header — pure-JVM RIFF chunk walk (no sound
    * library): `RIFF <size> WAVE`, then `<id(4)> <size(4 LE)>` chunks;
    * the `fmt ` chunk carries `audioFormat(2) channels(2)
    * sampleRate(4) byteRate(4) blockAlign(2) bitsPerSample(2)`, all
    * little-endian (RIFF/WAVE, Microsoft multimedia file spec).
    * Returns (sampleRate, channels, bitsPerSample, dataChunkBytes) —
    * dataChunkBytes is 0 when the `data` chunk is declared but the
    * payload is truncated before it. None when the payload is not a
    * well-formed WAV prefix.
    */
  def wavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] =
    wavChunks(bytes).collect {
      case w if w.rate > 0 && w.channels > 0 && w.bits > 0 =>
        (w.rate, w.channels, w.bits, math.max(0L, w.dataPresent))
    }

  /** The fmt fields + data-chunk location one RIFF/WAVE walk yields —
    * the SINGLE chunk-walk implementation behind both [[wavHeader]]
    * (metadata) and [[wavPcm16]] (sample extraction), so the pad-byte,
    * truncation, and overflow handling can never drift between them.
    * `dataOffset`/`dataPresent` are −1 when no data chunk was seen;
    * `dataPresent` is the bytes actually in the buffer (a declared-but-
    * truncated chunk yields what is present).
    */
  private final case class WavChunks(
      formatCode: Int, channels: Int, rate: Int, bits: Int,
      dataOffset: Int, dataPresent: Long)

  private def wavChunks(bytes: Array[Byte]): Option[WavChunks] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    def le32(o: Int): Long =
      u8(o).toLong | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) |
        (u8(o + 3).toLong << 24)
    def tag(o: Int, t: String): Boolean =
      o + 3 < bytes.length && (0 until 4).forall(j => u8(o + j) == t.charAt(j))
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    var dataOff = -1
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (fmt.isEmpty || dataOff < 0)) {
      val size = le32(i + 4)
      if (tag(i, "fmt ")) {
        if (size < 16 || i + 24 > bytes.length) return None
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      } else if (tag(i, "data")) {
        // size is declared; the chunk body may be truncated in a prefix
        dataOff = i + 8
        dataBytes = math.min(size, math.max(0L, bytes.length - (i + 8)))
      }
      // chunks are word-aligned: odd sizes carry one pad byte. Long
      // arithmetic: a (malformed) ~4 GiB declared size would overflow
      // Int and walk i backwards into an infinite loop.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > bytes.length) bytes.length else next.toInt
    }
    fmt.map { case (code, ch, rate, bits) =>
      WavChunks(code, ch, rate, bits, dataOff, dataBytes)
    }
  }

  /** Stub audio decode: deterministic arithmetic twin for payloads in no
    * real audio format — DuckDB-replicable from `octet_length` alone,
    * the q31/[[decodeStub]] pattern for the audio modality.
    */
  def audioStub(b: MediaBlob): AudioMeta = {
    val n = b.blob.length
    AudioMeta(b.doc_id, n, (n % 41 + 8) * 1000, n % 2 + 1, (n % 2 + 1) * 8,
      n % 100000)
  }

  /** Per-blob audio dispatch: real WAV headers decode to their true
    * rate/channels/width and an exact sample count from the data chunk;
    * anything else falls back to [[audioStub]].
    */
  def decodeAudioOne(b: MediaBlob): AudioMeta = wavHeader(b.blob) match {
    case Some((rate, ch, bits, dataBytes)) =>
      val frameBytes = math.max(1, ch * (bits / 8))
      AudioMeta(b.doc_id, b.blob.length, rate, ch, bits, dataBytes / frameBytes)
    case None => audioStub(b)
  }

  /** The audio-decode operator: binary blobs → typed audio metadata,
    * batched per partition like [[decode]].
    */
  def decodeAudio(blobs: Dataset[MediaBlob]): Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeAudioOne))
  }

  // q140 — the audio modality end-to-end: binary "audio" column →
  // partition-local WAV-or-stub decode → typed metadata, verified
  // against the stub arithmetic in SQL (the synthetic corpus carries no
  // RIFF signature, so every row takes the stub path — MultimodalSpec
  // drives the REAL path on AudioSystem-written WAV bytes).
  val q140AudioMeta: QueryDef = QueryDef.sql(
    "q140_audio_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST((octet_length(encode(text)) % 41 + 8) * 1000 AS INTEGER) AS sample_rate,
      |  CAST(octet_length(encode(text)) % 2 + 1 AS INTEGER) AS channels,
      |  CAST((octet_length(encode(text)) % 2 + 1) * 8 AS INTEGER) AS bits_per_sample,
      |  CAST(octet_length(encode(text)) % 100000 AS BIGINT) AS n_samples
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val blobs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[MediaBlob]
    decodeAudio(blobs).toDF().orderBy("doc_id")
  }

  // q148 — REAL PNG decode on the oracle path: each document's id seeds
  // a deterministic gray raster, which is ENCODED to a genuine PNG
  // (adaptive per-row filters, zlib deflate, CRC'd chunks — see
  // [[Png.encode]]) and DECODED back by the full pixel decoder
  // (inflate + unfilter, [[Png.decode]]). The sums below are computed
  // from the DECODER'S output bytes, so a wrong inflate, unfilter, CRC,
  // or filter-selection path cannot hash-match the oracle's closed-form
  // pixel arithmetic. Partition-local end to end — at 100 TB the codec
  // parallelizes with the file splits and no pixel byte ever shuffles.
  val q148PngDecode: QueryDef = QueryDef.sql(
    "q148_png_decode",
    """WITH dims AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
      |              FROM documents),
      |px AS (SELECT doc_id, w, h, i, (doc_id * 31 + i * 7) % 256 AS p
      |       FROM dims, generate_series(0, 223) g(i) WHERE i < w * h)
      |SELECT doc_id,
      |       CAST(MAX(w) AS INTEGER) AS width,
      |       CAST(MAX(h) AS INTEGER) AS height,
      |       CAST(1 AS INTEGER) AS channels,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((i + 1) * p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val px = Array.tabulate(w * h)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
        val img = Png.decode(Png.encode(w, h, 1, px)).getOrElse(
          throw new IllegalStateException(s"engine-encoded PNG failed to decode (doc $id)"))
        var sum = 0L; var ck = 0L; var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          sum += v
          ck = (ck + (i + 1).toLong * v) % 1000003L
          i += 1
        }
        (id, img.width, img.height, img.channels, sum, ck)
      }).toDF("doc_id", "width", "height", "channels", "pixel_sum", "checksum")
      .orderBy("doc_id")
  }

  // q149 — REAL pixel resampling: decode the engine-encoded PNG
  // ([[q148PngDecode]]'s raster), then 2× box-average downsample over
  // the DECODED bytes ([[Png.boxDownsample]] — per-channel block mean,
  // floor division). The oracle replays the block-mean arithmetic in
  // closed form, so the checksums pin the resampler's every output
  // byte, not just the target dims (which is all q59 could check).
  val q149PixelResize: QueryDef = QueryDef.sql(
    "q149_pixel_resize",
    """WITH dims AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
      |              FROM documents),
      |o AS (SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM dims),
      |px AS (SELECT doc_id, ow, oh, x, y,
      |         ((doc_id * 31 + ((2 * y) * w + 2 * x) * 7) % 256
      |        + (doc_id * 31 + ((2 * y) * w + 2 * x + 1) * 7) % 256
      |        + (doc_id * 31 + ((2 * y + 1) * w + 2 * x) * 7) % 256
      |        + (doc_id * 31 + ((2 * y + 1) * w + 2 * x + 1) * 7) % 256) // 4 AS p
      |       FROM o, generate_series(0, 7) gx(x), generate_series(0, 6) gy(y)
      |       WHERE x < ow AND y < oh)
      |SELECT doc_id,
      |       CAST(MAX(ow) AS INTEGER) AS out_w,
      |       CAST(MAX(oh) AS INTEGER) AS out_h,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((y * ow + x + 1) * p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val px = Array.tabulate(w * h)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
        val img = Png.decode(Png.encode(w, h, 1, px)).getOrElse(
          throw new IllegalStateException(s"engine-encoded PNG failed to decode (doc $id)"))
        val small = Png.boxDownsample(img, 2)
        var sum = 0L; var ck = 0L; var i = 0
        while (i < small.pixels.length) {
          val v = small.pixels(i) & 0xff
          sum += v
          ck = (ck + (i + 1).toLong * v) % 1000003L
          i += 1
        }
        (id, small.width, small.height, sum, ck)
      }).toDF("doc_id", "out_w", "out_h", "pixel_sum", "checksum")
      .orderBy("doc_id")
  }

  /** dHash — the difference-hash perceptual image signature (the standard
    * cheap near-dup sketch for image corpora, the pixel-space analog of
    * q23's text SimHash): bit j is set when the right-hand neighbor of
    * the j-th horizontally-adjacent pixel pair is strictly brighter.
    * Comparisons run row-major, skipping each row's last column, and cap
    * at `maxBits` so the signature packs into one BIGINT that both
    * engines can materialize exactly (DuckDB replays the bit build with
    * `1::BIGINT << j`). Gray rasters only — a real pipeline grayscales
    * before hashing, and our codec emits channels=1.
    */
  def dHash(img: Png.Image, maxBits: Int = 60): Long = {
    require(img.channels == 1, s"dHash expects a gray raster, got ${img.channels} channels")
    var hash = 0L
    var j = 0
    var y = 0
    while (y < img.height && j < maxBits) {
      var x = 0
      while (x < img.width - 1 && j < maxBits) {
        val p0 = img.pixels(y * img.width + x) & 0xff
        val p1 = img.pixels(y * img.width + x + 1) & 0xff
        if (p1 > p0) hash |= 1L << j
        j += 1
        x += 1
      }
      y += 1
    }
    hash
  }

  /** q148's seeded raster pushed through the REAL codec round-trip and
    * hashed: one row per document with its decoded dims and [[dHash]].
    * Partition-local end to end — the signature computation adds zero
    * shuffle on top of the decode.
    */
  private def dhashRows(s: SparkSession, d: String): Dataset[(Long, Int, Int, Long)] = {
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val px = Array.tabulate(w * h)(i => ((id * 31 + i.toLong * 7) % 256).toByte)
        val img = Png.decode(Png.encode(w, h, 1, px)).getOrElse(
          throw new IllegalStateException(s"engine-encoded PNG failed to decode (doc $id)"))
        (id, img.width, img.height, dHash(img))
      })
  }

  /** Shared oracle CTE: the closed-form pixel arithmetic rebuilt into the
    * same row-major capped bit stream ([[dHash]]'s j = i - i/w because
    * each row contributes w-1 comparisons). The shift guard lives in the
    * WHERE — DuckDB evaluates CASE branches vectorized, so an out-of-range
    * `<< j` must never reach the expression.
    */
  private val dhashSqlCte =
    """dims AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h FROM documents),
      |g AS (SELECT doc_id, w, h, i,
      |        i - (i // w) AS j,
      |        (doc_id * 31 + i * 7) % 256 AS p0,
      |        (doc_id * 31 + (i+1) * 7) % 256 AS p1
      |      FROM dims, generate_series(0, 223) gs(i)
      |      WHERE i < w*h - 1 AND (i % w) < w - 1 AND i - (i // w) < 60),
      |hs AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
      |         SUM(CASE WHEN p1 > p0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS dhash
      |       FROM g GROUP BY doc_id)""".stripMargin

  // q152 — perceptual IMAGE dedup on the hash gate: every doc's raster
  // round-trips the real PNG codec, the DECODED bytes are dHash'd, and
  // docs are bucketed by (dims, signature) — the image-modality twin of
  // q21's exact text dedup (same canonical-representative output shape:
  // min doc_id per bucket + bucket size). Scale shape: decode + hash are
  // a partition-local projection; the only shuffle is ONE window keyed by
  // the bucket — no pixel byte ever leaves its partition.
  val q152ImageDhash: QueryDef = QueryDef.sql(
    "q152_image_dhash",
    s"""WITH $dhashSqlCte
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |       CAST(dhash AS BIGINT) AS dhash,
      |       CAST(MIN(doc_id) OVER (PARTITION BY w, h, dhash) AS BIGINT) AS canonical_id,
      |       CAST(COUNT(*) OVER (PARTITION BY w, h, dhash) AS BIGINT) AS bucket_size
      |FROM hs ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("width", "height", "dhash")
    dhashRows(s, d).toDF("doc_id", "width", "height", "dhash")
      .select(col("doc_id"), col("width"), col("height"), col("dhash"),
        min("doc_id").over(win).as("canonical_id"),
        count(lit(1)).over(win).as("bucket_size"))
      .orderBy("doc_id")
  }

  // q153 — image NEAR-dup via banded Hamming LSH over the dHash: the
  // 60-bit signature splits into 4 bands of 15 bits; only docs sharing
  // (dims, band, band-value) ever meet, candidates generate inside the
  // bucket's reducer (q22's no-self-join pattern), and every candidate is
  // verified with an exact popcount. Pigeonhole makes the banding
  // LOSSLESS at the τ=3 threshold — 3 bit errors cannot touch all 4
  // bands, so some band matches exactly and recall is 100% — which is
  // what lets the all-pairs DuckDB form oracle the banded plan
  // bit-for-bit. Scale: shuffle is keyed by band value; the quadratic is
  // confined to hash-equal buckets (near-dup mass, not corpus size).
  /** q153's kernel, standalone: banded-Hamming image near-dup pairs
    * (id_a < id_b, exact popcount ≤ 3) — reused by the cross-modal
    * overlap report (q159).
    */
  private def imageNeardupPairs(s: SparkSession, d: String): DataFrame =
    bandedNeardupPairs(dhashRows(s, d).toDF("doc_id", "width", "height", "dhash"))

  /** The banded-Hamming kernel over any (doc_id, width, height, dhash)
    * frame — q153 feeds it the whole corpus, q250 only the exact-dedup
    * canonicals (near-dup pruning after exact dedup never needs the
    * dominated copies).
    */
  private def bandedNeardupPairs(hashes: DataFrame): DataFrame = {
    val bands = hashes.select(
      col("width"), col("height"),
      struct(col("doc_id"), col("dhash")).as("m"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), 15 * b).bitwiseAND(lit(32767L)).as("bval"))): _*)).as("bk"))
    val buckets = bands
      .groupBy(col("width"), col("height"), col("bk.band"), col("bk.bval"))
      .agg(sort_array(collect_list(col("m"))).as("ms"))
      .filter(size(col("ms")) >= 2)
    Dedup.bucketPairs(buckets, "ms", "a", "b")
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct() // a pair may collide in several bands; count it once
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
  }

  val q153ImageNeardup: QueryDef = QueryDef.sql(
    "q153_image_neardup",
    s"""WITH $dhashSqlCte
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
      |FROM hs a JOIN hs b ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    imageNeardupPairs(s, d).orderBy("id_a", "id_b")
  }

  /** Minimal canonical WAV writer — 44-byte PCM16 mono header + LE
    * samples (the inverse of [[wavHeader]]/[[wavPcm16]], the same
    * render-then-reparse discipline as the PNG codec and the
    * `graft-offers` sink).
    */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(v => out.putShort(v))
    out.array()
  }

  /** Extract the PCM16 sample stream from a mono 16-bit WAV — the same
    * RIFF chunk walk as [[wavHeader]] but materializing the data chunk's
    * little-endian samples. None when the payload is not mono 16-bit PCM
    * (or the walk fails); a truncated data chunk yields the samples that
    * are actually present, like [[wavHeader]]'s byte count.
    */
  def wavPcm16(bytes: Array[Byte]): Option[Array[Short]] =
    wavChunks(bytes).collect {
      // mono 16-bit integer PCM only — anything else is not this codec
      case w if w.formatCode == 1 && w.channels == 1 && w.bits == 16 &&
          w.dataOffset >= 0 =>
        val n = w.dataPresent.toInt
        Array.tabulate(n / 2)(k =>
          (((bytes(w.dataOffset + 2 * k) & 0xff) |
            (bytes(w.dataOffset + 2 * k + 1) << 8))).toShort)
    }

  /** G.711 µ-law compression (CCITT G.711, the Sun g711.c reference
    * algorithm — BIAS 0x84, CLIP 32635): 16-bit linear PCM → 8-bit
    * companded byte, the format 8 kHz telephony corpora arrive in.
    * Exactly the JDK ULAW codec's arithmetic (MultimodalSpec
    * cross-checks byte-for-byte), and exactly replayable in integer
    * SQL — which is what puts the companding on the oracle gate (q196).
    */
  def mulawEncode(pcm: Short): Byte = {
    val sign = if (pcm < 0) 0x80 else 0
    val m = math.min(math.abs(pcm.toInt), 32635) + 132
    val e =
      if (m >= 16384) 7 else if (m >= 8192) 6 else if (m >= 4096) 5
      else if (m >= 2048) 4 else if (m >= 1024) 3 else if (m >= 512) 2
      else if (m >= 256) 1 else 0
    val mant = (m >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | mant)).toByte
  }

  /** The inverse companding: µ-law byte → the quantized 16-bit sample
    * (the segment midpoint the encoder's mantissa truncation maps to).
    */
  def mulawDecode(mu: Byte): Short = {
    val u = (~mu) & 0xff
    val e = (u >> 4) & 7
    val mag = ((((u & 0x0f) << 3) + 132) << e) - 132
    (if ((u & 0x80) != 0) -mag else mag).toShort
  }

  /** The G.711 WAV container: format tag 7 (µ-law), mono, 8 bits per
    * sample — same canonical 44-byte layout as [[wavBytes]], one byte
    * per sample. */
  def wavBytesMulaw(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + samples.length)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7) // G.711 µ-law
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate: one byte per sample
      .putShort(1) // block align
      .putShort(8) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(samples.length)
    out.put(samples)
    out.array()
  }

  /** Extract the companded byte stream from a mono 8-bit µ-law WAV —
    * the same [[wavChunks]] walk as [[wavPcm16]], gated on format tag 7
    * (a PCM file is NOT this codec and fails closed, and vice versa).
    */
  def wavMulaw(bytes: Array[Byte]): Option[Array[Byte]] =
    wavChunks(bytes).collect {
      case w if w.formatCode == 7 && w.channels == 1 && w.bits == 8 &&
          w.dataOffset >= 0 =>
        java.util.Arrays.copyOfRange(bytes, w.dataOffset,
          w.dataOffset + w.dataPresent.toInt)
    }

  // q154 — the audio modality's q148: a seeded PCM16 signal is rendered
  // to REAL WAV bytes ([[wavBytes]]) and decoded back by the real RIFF
  // walk ([[wavPcm16]]); frame-level features — per-256-sample-frame
  // absolute energy and zero-crossing count, the standard first-line
  // audio featurizer — are computed from the DECODER'S samples, so a
  // wrong header, endianness, offset, or truncation path cannot
  // hash-match the oracle's closed-form signal arithmetic. Phase step
  // 12289 ≈ rate/5.3 keeps the synthetic tone crossing zero every ~2.7
  // samples (a slow ramp would make every crossing count 0 and verify
  // nothing). Partition-local end to end; ~2 frame rows per doc.
  val q154AudioFrames: QueryDef = QueryDef.sql(
    "q154_audio_frames",
    """WITH s AS (SELECT doc_id, i, i // 256 AS f,
      |             ((doc_id*17 + i*12289) % 65536) - 32768 AS v
      |           FROM documents, generate_series(0, 499) g(i)
      |           WHERE i < 200 + doc_id % 300),
      |w AS (SELECT doc_id, i, f, v,
      |             LEAD(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv,
      |             LEAD(f) OVER (PARTITION BY doc_id ORDER BY i) AS nf FROM s)
      |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(COUNT(*) AS INTEGER) AS n_samples,
      |       CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
      |       CAST(COUNT(*) FILTER (nf = f AND ((v < 0) != (nv < 0))) AS INTEGER) AS crossings
      |FROM w GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val n = (200 + id % 300).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 17 + i.toLong * 12289) % 65536) - 32768).toShort)
        val dec = wavPcm16(wavBytes(samples, 16000)).getOrElse(
          throw new IllegalStateException(s"engine-rendered WAV failed to parse (doc $id)"))
        val frames = (dec.length + 255) / 256
        (0 until frames).map { f =>
          val lo = f * 256
          val hi = math.min(lo + 256, dec.length)
          var sumAbs = 0L
          var cross = 0
          var i = lo
          while (i < hi) {
            sumAbs += math.abs(dec(i).toLong)
            if (i + 1 < hi && ((dec(i) < 0) != (dec(i + 1) < 0))) cross += 1
            i += 1
          }
          (id, f, hi - lo, sumAbs, cross)
        }
      }).toDF("doc_id", "frame_idx", "n_samples", "sum_abs", "crossings")
      .orderBy("doc_id", "frame_idx")
  }

  /** Minimal canonical AVI writer — a REAL RIFF 'AVI ' container
    * (Microsoft AVI spec): LIST 'hdrl' with the 56-byte 'avih' main
    * header and a LIST 'strl' ('strh' video stream header + 'strf'
    * BITMAPINFOHEADER), then LIST 'movi' holding one '00dc' chunk per
    * frame. `codec` is the frame format's fourcc — Motion-PNG ("MPNG",
    * each chunk a complete PNG stream) or Motion-JPEG ("MJPG", each
    * chunk a complete baseline JPEG — the dominant real-world AVI
    * payload); both are registered codecs and both decode with the
    * pure-JVM family codecs via [[decodeFrame]]'s fourcc dispatch.
    * Little-endian throughout, odd chunks padded per RIFF.
    */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int,
      usPerFrame: Int = 40000, codec: String = "MPNG"): Array[Byte] = {
    require(codec.length == 4, "codec is a fourcc")
    def fourcc(t: String): Array[Byte] = t.getBytes("US-ASCII")
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc(typ) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(typ) ++ body
    val avih = chunk("avih", // MainAVIHeader: 14 DWORDs
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
        le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh", // AVIStreamHeader: fccType vids + handler
      fourcc("vids") ++ fourcc(codec) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(usPerFrame) ++ le32(1000000) ++ le32(0) ++ le32(frames.length) ++
        le32(0) ++ le32(0) ++ le32(0) ++
        // rcFrame: four 16-bit words (left, top, right, bottom)
        Array(0, 0, 0, 0).map(_.toByte) ++
        Array((width & 0xff).toByte, ((width >> 8) & 0xff).toByte,
          (height & 0xff).toByte, ((height >> 8) & 0xff).toByte))
    val strf = chunk("strf", // BITMAPINFOHEADER, biCompression = codec
      le32(40) ++ le32(width) ++ le32(height) ++
        Array(1, 0, 8, 0).map(_.toByte) ++ fourcc(codec) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Parse a REAL AVI container — pure-JVM nested RIFF walk: verifies
    * the 'RIFF…AVI ' envelope, reads the declared frame total from the
    * 'avih' main header inside LIST 'hdrl', and collects every video
    * frame chunk ('00dc'/'00db') from LIST 'movi' in stream order.
    * Returns (declaredFrames, framePayloads); None when the payload is
    * not a well-formed AVI prefix. The walk is size-driven like
    * [[wavHeader]]'s — a malformed ~4 GiB declared chunk cannot loop.
    */
  def aviFrames(bytes: Array[Byte]): Option[(Int, Seq[Array[Byte]])] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le32(o: Int): Long =
      u8(o).toLong | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) |
        (u8(o + 3).toLong << 24)
    def tag(o: Int, t: String): Boolean =
      o + 3 < bytes.length && (0 until 4).forall(j => u8(o + j) == t.charAt(j))
    if (bytes.length < 24 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var declared = -1
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size = le32(i + 4)
        val end = i.toLong + 8L + size
        if (end > to) return false // declared size runs past the envelope
        if (tag(i, "LIST")) {
          if (size < 4) return false
          if (!walk(i + 12, end.toInt, inMovi || tag(i + 8, "movi"))) return false
        } else if (tag(i, "avih")) {
          if (size < 56) return false
          declared = le32(i + 8 + 16).toInt // dwTotalFrames, 5th DWORD
        } else if (inMovi && (tag(i, "00dc") || tag(i, "00db"))) {
          frames += java.util.Arrays.copyOfRange(bytes, i + 8, end.toInt)
        }
        i = (end + (size & 1L)).toInt // RIFF word alignment
      }
      true
    }
    if (!walk(12, bytes.length, inMovi = false)) return None
    if (declared < 0) None else Some((declared, frames.result()))
  }

  /** The video stream's codec fourcc: the 'strh' handler of the first
    * 'vids' stream header — what a real player dispatches its frame
    * decoder on. Same size-driven RIFF walk as [[aviFrames]]; None when
    * the container has no well-formed vids 'strh'.
    */
  def aviVideoCodec(bytes: Array[Byte]): Option[String] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le32(o: Int): Long =
      u8(o).toLong | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) |
        (u8(o + 3).toLong << 24)
    def tag(o: Int, t: String): Boolean =
      o + 3 < bytes.length && (0 until 4).forall(j => u8(o + j) == t.charAt(j))
    if (bytes.length < 24 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var codec: Option[String] = None
    def walk(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to && codec.isEmpty) {
        val size = le32(i + 4)
        val end = i.toLong + 8L + size
        if (end > to) return false
        if (tag(i, "LIST")) {
          if (size < 4) return false
          if (!walk(i + 12, end.toInt)) return false
        } else if (tag(i, "strh") && size >= 8 && tag(i + 8, "vids")) {
          codec = Some(new String(bytes, i + 12, 4, "US-ASCII"))
        }
        i = (end + (size & 1L)).toInt
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    codec
  }

  /** Fourcc-dispatched frame decode — the pure-JVM codec registry a
    * multimodal pipeline keys on the container's declared handler
    * ([[aviVideoCodec]]) rather than sniffing each payload: MPNG →
    * [[graft.operators.Png.decode]], MJPG → [[graft.operators.Jpeg.decode]];
    * unknown fourccs fail closed (None), like every malformed-input
    * path in the family.
    */
  def decodeFrame(codec: String, bytes: Array[Byte]): Option[Png.Image] =
    codec match {
      case "MPNG" => Png.decode(bytes)
      case "MJPG" => Jpeg.decode(bytes)
      case _ => None
    }

  // q196 — G.711 µ-LAW telephony audio on the gate: q154's seeded tone
  // COMPANDED through the real codec ([[mulawEncode]] — CCITT G.711,
  // the 8-bit format speech corpora actually ship in), wrapped in a
  // format-tag-7 WAV ([[wavBytesMulaw]]), parsed back by the shared
  // RIFF walk gated on the tag ([[wavMulaw]] — a PCM file fails closed
  // here and vice versa), expanded ([[mulawDecode]]), and featurized
  // exactly like q154. The oracle replays the LOSSY quantization
  // itself in integer SQL (sign/segment/mantissa arithmetic, verified
  // against the reference algorithm over all 65536 inputs in
  // MultimodalSpec + the JDK ULAW codec cross-check), so a wrong CLIP,
  // BIAS, segment threshold, or complement cannot hash-match — the
  // sums are over quantized magnitudes, not the input tone's.
  // Partition-local end to end, like the whole modality family.
  val q196AudioMulaw: QueryDef = QueryDef.sql(
    "q196_audio_mulaw",
    """WITH s AS (SELECT doc_id, i, i // 256 AS f,
      |             ((doc_id*17 + i*12289) % 65536) - 32768 AS v
      |           FROM documents, generate_series(0, 499) g(i)
      |           WHERE i < 200 + doc_id % 300),
      |e AS (SELECT doc_id, i, f, v,
      |             CASE WHEN LEAST(ABS(v), 32635) + 132 >= 16384 THEN 7
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 8192 THEN 6
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 4096 THEN 5
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 2048 THEN 4
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 1024 THEN 3
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 512 THEN 2
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 256 THEN 1
      |                  ELSE 0 END AS seg
      |      FROM s),
      |q AS (SELECT doc_id, i, f,
      |             (CASE WHEN v < 0 THEN -1 ELSE 1 END) *
      |             ((((((LEAST(ABS(v), 32635) + 132) >> (seg + 3)) & 15)
      |                * 8 + 132) << seg) - 132) AS dv
      |      FROM e),
      |w AS (SELECT doc_id, i, f, dv,
      |             LEAD(dv) OVER (PARTITION BY doc_id ORDER BY i) AS nv,
      |             LEAD(f) OVER (PARTITION BY doc_id ORDER BY i) AS nf FROM q)
      |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(COUNT(*) AS INTEGER) AS n_samples,
      |       CAST(SUM(ABS(dv)) AS BIGINT) AS sum_abs,
      |       CAST(COUNT(*) FILTER (nf = f AND ((dv < 0) != (nv < 0))) AS INTEGER) AS crossings
      |FROM w GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val n = (200 + id % 300).toInt
        val pcm = Array.tabulate(n)(i =>
          (((id * 17 + i.toLong * 12289) % 65536) - 32768).toShort)
        val wav = wavBytesMulaw(pcm.map(mulawEncode), 8000)
        val companded = wavMulaw(wav).getOrElse(
          throw new IllegalStateException(s"engine-rendered G.711 WAV failed to parse (doc $id)"))
        val dec = companded.map(mulawDecode)
        val frames = (dec.length + 255) / 256
        (0 until frames).map { f =>
          val lo = f * 256
          val hi = math.min(lo + 256, dec.length)
          var sumAbs = 0L
          var cross = 0
          var i = lo
          while (i < hi) {
            sumAbs += math.abs(dec(i).toLong)
            if (i + 1 < hi && ((dec(i) < 0) != (dec(i + 1) < 0))) cross += 1
            i += 1
          }
          (id, f, hi - lo, sumAbs, cross)
        }
      }).toDF("doc_id", "frame_idx", "n_samples", "sum_abs", "crossings")
      .orderBy("doc_id", "frame_idx")
  }

  // q155 — the VIDEO modality made real (upgrades q60's stub frame
  // arithmetic the way q148 upgraded q31): per doc, a seeded Motion-PNG
  // clip is rendered to a genuine AVI (nested RIFF lists, avih frame
  // total, '00dc' chunks — [[aviBytes]]), the container is walked BACK by
  // the real parser ([[aviFrames]]), every ceil(n/8)-th frame is sampled
  // (q60's even-sampling contract — the seek a real pipeline does), and
  // the SAMPLED frames are PNG-decoded to pixels. Sums come from the
  // decoded bytes of the parsed chunks, so a mis-walked chunk boundary,
  // wrong frame order, or bad frame payload cannot hash-match the
  // oracle's closed-form pixel arithmetic. Partition-local end to end.
  val q155VideoFrames: QueryDef = QueryDef.sql(
    "q155_video_frames",
    """WITH m AS (SELECT doc_id, 2 + doc_id % 9 AS n,
      |                  4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |           FROM documents),
      |fr AS (SELECT doc_id, n, w, h, f FROM m, generate_series(0, 10) g(f)
      |       WHERE f < n AND f % ((n + 7) // 8) = 0),
      |px AS (SELECT doc_id, f, n, w, h, i, (doc_id*31 + f*11 + i*7) % 256 AS p
      |       FROM fr, generate_series(0, 47) gi(i) WHERE i < w*h)
      |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(MAX(n) AS INTEGER) AS n_frames,
      |       CAST(MAX(w) AS INTEGER) AS width,
      |       CAST(MAX(h) AS INTEGER) AS height,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((i + 1) * p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val n = (2 + id % 9).toInt
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val rendered = (0 until n).map { f =>
          Png.encode(w, h, 1,
            Array.tabulate(w * h)(i => ((id * 31 + f * 11L + i.toLong * 7) % 256).toByte))
        }
        val (declared, frames) = aviFrames(aviBytes(rendered, w, h)).getOrElse(
          throw new IllegalStateException(s"engine-rendered AVI failed to parse (doc $id)"))
        require(declared == frames.length,
          s"frame chunks (${frames.length}) disagree with avih total ($declared) for doc $id")
        val step = (declared + 7) / 8
        (0 until declared).filter(_ % step == 0).map { f =>
          val img = Png.decode(frames(f)).getOrElse(
            throw new IllegalStateException(s"frame $f of doc $id failed to decode"))
          var sum = 0L
          var ck = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            ck = (ck + (i + 1).toLong * v) % 1000003L
            i += 1
          }
          (id, f, declared, img.width, img.height, sum, ck)
        }
      }).toDF("doc_id", "frame_idx", "n_frames", "width", "height", "pixel_sum", "checksum")
      .orderBy("doc_id", "frame_idx")
  }

  // q195 — MOTION-JPEG AVI: the same container walk as q155 carrying
  // the codec most real-world AVIs do, decoded by the round's baseline
  // JPEG decoder — and dispatched the way a real player does it: the
  // frame decoder is chosen by the container's DECLARED handler fourcc
  // ([[aviVideoCodec]] → [[decodeFrame]]), not by sniffing payloads, so
  // a wrong strh walk or a mislabeled codec fails loudly instead of
  // accidentally decoding. Frames are flat-8×8-block JPEGs (q179's
  // bit-exact trick; every 4th doc adds DRI/RSTn restarts INSIDE the
  // container), every ceil(n/8)-th frame is sampled, and sums come from
  // the dispatched decoder's output bytes vs the oracle's closed-form
  // block arithmetic. Partition-local end to end.
  val q195VideoMjpeg: QueryDef = QueryDef.sql(
    "q195_video_mjpeg",
    """WITH m AS (SELECT doc_id, 2 + doc_id % 9 AS n, 1 + doc_id % 3 AS wb,
      |                  1 + doc_id % 2 AS hb
      |           FROM documents),
      |fr AS (SELECT doc_id, n, wb, hb, f FROM m, generate_series(0, 10) g(f)
      |       WHERE f < n AND f % ((n + 7) // 8) = 0),
      |px AS (SELECT doc_id, f, n, wb, hb, i,
      |              (doc_id*37 + f*13
      |               + ((i // (8*wb)) // 8 * wb + ((i % (8*wb)) // 8)) * 11)
      |              % 256 AS p
      |       FROM fr, generate_series(0, 383) gi(i) WHERE i < 64*wb*hb)
      |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
      |       CAST(MAX(n) AS INTEGER) AS n_frames,
      |       'MJPG' AS codec,
      |       CAST(MAX(wb)*8 AS INTEGER) AS width,
      |       CAST(MAX(hb)*8 AS INTEGER) AS height,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((i+1)*p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.flatMap { id =>
        val n = (2 + id % 9).toInt
        val wb = (1 + id % 3).toInt
        val hb = (1 + id % 2).toInt
        val ri = if (id % 4 == 0) 2 else 0
        val rendered = (0 until n).map { f =>
          Jpeg.encodeGray(wb, hb,
            Array.tabulate(wb * hb)(b => ((id * 37 + f * 13L + b.toLong * 11) % 256).toInt),
            ri)
        }
        val avi = aviBytes(rendered, wb * 8, hb * 8, codec = "MJPG")
        val codec = aviVideoCodec(avi).getOrElse(
          throw new IllegalStateException(s"engine-rendered AVI lost its strh (doc $id)"))
        val (declared, frames) = aviFrames(avi).getOrElse(
          throw new IllegalStateException(s"engine-rendered AVI failed to parse (doc $id)"))
        require(declared == frames.length,
          s"frame chunks (${frames.length}) disagree with avih total ($declared) for doc $id")
        val step = (declared + 7) / 8
        (0 until declared).filter(_ % step == 0).map { f =>
          val img = decodeFrame(codec, frames(f)).getOrElse(
            throw new IllegalStateException(s"frame $f of doc $id failed to decode as $codec"))
          var sum = 0L
          var ck = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = img.pixels(i) & 0xff
            sum += v
            ck = (ck + (i + 1).toLong * v) % 1000003L
            i += 1
          }
          (id, f, declared, codec, img.width, img.height, sum, ck)
        }
      }).toDF("doc_id", "frame_idx", "n_frames", "codec", "width", "height",
        "pixel_sum", "checksum")
      .orderBy("doc_id", "frame_idx")
  }

  /** An AVI with BOTH a video stream and an interleaved AUDIO stream
    * (the real-world camera-clip layout): LIST 'hdrl' declares
    * dwStreams=2 with a 'vids' strl (as [[aviBytes]]) and an 'auds'
    * strl whose 'strf' is a WAVEFORMATEX (format tag 7 = G.711 µ-law,
    * mono, 8-bit); LIST 'movi' interleaves one '00dc' chunk and one
    * '01wb' audio chunk per frame (audio split at `samplesPerChunk`
    * bytes; any remainder trails as one extra '01wb' — real muxers do
    * the same for the A/V length mismatch).
    */
  def aviAvBytes(frames: Seq[Array[Byte]], width: Int, height: Int,
      audio: Array[Byte], sampleRate: Int, samplesPerChunk: Int,
      usPerFrame: Int = 40000, codec: String = "MPNG"): Array[Byte] = {
    require(codec.length == 4, "codec is a fourcc")
    def fourcc(t: String): Array[Byte] = t.getBytes("US-ASCII")
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc(typ) ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4) ++ fourcc(typ) ++ body
    val avih = chunk("avih",
      le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(frames.length) ++ le32(0) ++ le32(2) ++ le32(0) ++
        le32(width) ++ le32(height) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strhV = chunk("strh",
      fourcc("vids") ++ fourcc(codec) ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(usPerFrame) ++ le32(1000000) ++ le32(0) ++ le32(frames.length) ++
        le32(0) ++ le32(0) ++ le32(0) ++
        Array(0, 0, 0, 0).map(_.toByte) ++
        Array((width & 0xff).toByte, ((width >> 8) & 0xff).toByte,
          (height & 0xff).toByte, ((height >> 8) & 0xff).toByte))
    val strfV = chunk("strf",
      le32(40) ++ le32(width) ++ le32(height) ++
        Array(1, 0, 8, 0).map(_.toByte) ++ fourcc(codec) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strhA = chunk("strh", // AVIStreamHeader: auds, scale 1 / rate Hz
      fourcc("auds") ++ fourcc("G711") ++ le32(0) ++ le32(0) ++ le32(0) ++
        le32(1) ++ le32(sampleRate) ++ le32(0) ++ le32(audio.length) ++
        le32(0) ++ le32(0) ++ le32(1) ++
        Array.fill(8)(0.toByte))
    val strfA = chunk("strf", // WAVEFORMATEX: µ-law mono 8-bit
      le16(7) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate) ++
        le16(1) ++ le16(8) ++ le16(0))
    val hdrl = list("hdrl",
      avih ++ list("strl", strhV ++ strfV) ++ list("strl", strhA ++ strfA))
    val moviBody = new scala.collection.mutable.ArrayBuffer[Byte]()
    var aOff = 0
    for (f <- frames) {
      moviBody ++= chunk("00dc", f)
      val end = math.min(aOff + samplesPerChunk, audio.length)
      if (end > aOff) {
        moviBody ++= chunk("01wb",
          java.util.Arrays.copyOfRange(audio, aOff, end))
        aOff = end
      }
    }
    if (aOff < audio.length) // the A/V tail mismatch, as one extra chunk
      moviBody ++= chunk("01wb",
        java.util.Arrays.copyOfRange(audio, aOff, audio.length))
    val movi = list("movi", moviBody.toArray)
    fourcc("RIFF") ++ le32(4 + hdrl.length + movi.length) ++
      fourcc("AVI ") ++ hdrl ++ movi
  }

  /** The audio track of an AVI: the first 'auds' stream's WAVEFORMATEX
    * (format tag + sample rate from the strl's 'strf') plus its '01wb'
    * chunks concatenated in movi order. None when there is no
    * well-formed auds stream — same size-driven walk and fail-closed
    * contract as [[aviFrames]]/[[aviVideoCodec]].
    */
  def aviAudio(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u8(o: Int): Int = bytes(o) & 0xff
    def le16(o: Int): Int = u8(o) | (u8(o + 1) << 8)
    def le32(o: Int): Long =
      u8(o).toLong | (u8(o + 1).toLong << 8) | (u8(o + 2).toLong << 16) |
        (u8(o + 3).toLong << 24)
    def tag(o: Int, t: String): Boolean =
      o + 3 < bytes.length && (0 until 4).forall(j => u8(o + j) == t.charAt(j))
    if (bytes.length < 24 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var fmt: Option[(Int, Int)] = None // (formatTag, sampleRate)
    var sawAudsStrh = false
    val data = new scala.collection.mutable.ArrayBuffer[Byte]()
    def walk(from: Int, to: Int): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size = le32(i + 4)
        val end = i.toLong + 8L + size
        if (end > to) return false
        if (tag(i, "LIST")) {
          if (size < 4) return false
          if (!walk(i + 12, end.toInt)) return false
        } else if (tag(i, "strh") && size >= 8) {
          sawAudsStrh = tag(i + 8, "auds")
        } else if (tag(i, "strf") && sawAudsStrh) {
          if (fmt.isEmpty) {
            if (size < 16) return false
            fmt = Some((le16(i + 8), le32(i + 12).toInt))
          }
          sawAudsStrh = false
        } else if (tag(i, "01wb")) {
          data ++= java.util.Arrays.copyOfRange(bytes, i + 8, end.toInt)
        }
        i = (end + (size & 1L)).toInt
      }
      true
    }
    if (!walk(12, bytes.length)) return None
    fmt.map { case (t, r) => (t, r, data.toArray) }
  }

  // q203 — INTERLEAVED AUDIO+VIDEO container: the round's video and
  // audio codecs composed into the real-world camera-clip layout — one
  // AVI carrying a 'vids' stream (Motion-PNG frames) AND an 'auds'
  // stream (G.711 µ-law, format declared in the strl's WAVEFORMATEX),
  // '00dc'/'01wb' chunks interleaved per frame with the audio tail
  // remainder trailing (how real muxers express A/V length mismatch).
  // The operator demuxes BOTH streams from the one byte stream
  // ([[aviFrames]] + [[aviAudio]]), dispatches each to its codec
  // (declared fourcc → PNG pixels; declared format tag 7 → µ-law
  // expansion), and reports the A/V SYNC DIAGNOSTIC every ingest
  // pipeline needs: per-stream durations in exact ms and their delta
  // (seeded to id % 7 by construction). Everything integer-exact:
  // pixel sums from decoded frames, companded-magnitude sums through
  // the same lossy quantization the oracle replays (q196's kernel).
  // Partition-local end to end.
  val q203AvInterleave: QueryDef = QueryDef.sql(
    "q203_av_interleave",
    """WITH m AS (SELECT doc_id, 2 + doc_id % 5 AS n, 1 + doc_id % 2 AS wb
      |           FROM documents),
      |vp AS (SELECT doc_id, SUM((doc_id*31 + f*17 + i*5) % 256) AS video_px_sum
      |       FROM m, generate_series(0, 6) gf(f), generate_series(0, 127) gi(i)
      |       WHERE f < n AND i < 64 * wb GROUP BY doc_id),
      |au AS (SELECT doc_id, n, i,
      |             ((doc_id*13 + i*7919) % 65536) - 32768 AS v
      |       FROM m, generate_series(0, 2015) g(i)
      |       WHERE i < n * 320 + (doc_id % 7) * 8),
      |e AS (SELECT doc_id, n, i, v,
      |             CASE WHEN LEAST(ABS(v), 32635) + 132 >= 16384 THEN 7
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 8192 THEN 6
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 4096 THEN 5
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 2048 THEN 4
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 1024 THEN 3
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 512 THEN 2
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 256 THEN 1
      |                  ELSE 0 END AS seg
      |      FROM au),
      |q AS (SELECT doc_id, n,
      |             CAST(COUNT(*) AS INTEGER) AS n_samples,
      |             CAST(SUM(ABS((((((LEAST(ABS(v), 32635) + 132) >> (seg + 3)) & 15)
      |                * 8 + 132) << seg) - 132)) AS BIGINT) AS audio_sum_abs
      |      FROM e GROUP BY doc_id, n)
      |SELECT q.doc_id,
      |  CAST(q.n AS INTEGER) AS n_frames,
      |  q.n_samples,
      |  CAST(q.n * 40 AS INTEGER) AS video_ms,
      |  CAST(q.n_samples // 8 AS INTEGER) AS audio_ms,
      |  CAST(q.doc_id % 7 AS INTEGER) AS av_delta_ms,
      |  CAST(vp.video_px_sum AS BIGINT) AS video_px_sum,
      |  q.audio_sum_abs
      |FROM q JOIN vp USING (doc_id) ORDER BY q.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (2 + id % 5).toInt
        val wb = (1 + id % 2).toInt
        val w = wb * 8
        val rendered = (0 until n).map { f =>
          Png.encode(w, 8, 1, Array.tabulate(w * 8)(i =>
            ((id * 31 + f * 17L + i.toLong * 5) % 256).toByte))
        }
        val nSamples = n * 320 + (id % 7).toInt * 8
        val pcm = Array.tabulate(nSamples)(i =>
          (((id * 13 + i.toLong * 7919) % 65536) - 32768).toShort)
        val avi = aviAvBytes(rendered, w, 8, pcm.map(mulawEncode), 8000, 320)
        // demux both streams from the single byte stream
        val (declared, frames) = aviFrames(avi).getOrElse(
          throw new IllegalStateException(s"AV AVI lost its video (doc $id)"))
        require(declared == n && frames.length == n,
          s"video stream mangled (doc $id)")
        val codec = aviVideoCodec(avi).getOrElse(
          throw new IllegalStateException(s"AV AVI lost its strh (doc $id)"))
        val (fmtTag, rate, companded) = aviAudio(avi).getOrElse(
          throw new IllegalStateException(s"AV AVI lost its audio (doc $id)"))
        require(fmtTag == 7 && rate == 8000, s"audio format mangled (doc $id)")
        var vSum = 0L
        for (f <- frames) {
          val img = decodeFrame(codec, f).getOrElse(
            throw new IllegalStateException(s"frame failed to decode (doc $id)"))
          img.pixels.foreach(p => vSum += (p & 0xff))
        }
        var aSum = 0L
        companded.foreach(b => aSum += math.abs(mulawDecode(b).toLong))
        val videoMs = n * 40
        val audioMs = companded.length / 8 // 8 kHz → 8 samples per ms
        (id, n, companded.length, videoMs, audioMs,
          math.abs(videoMs - audioMs), vSum, aSum)
      }).toDF("doc_id", "n_frames", "n_samples", "video_ms", "audio_ms",
        "av_delta_ms", "video_px_sum", "audio_sum_abs")
      .orderBy("doc_id")
  }

  // q201 — PROGRESSIVE JPEG decode on the oracle path: the OTHER
  // Huffman DCT mode real web images ship in (SOF2 — multi-scan
  // spectral selection + successive approximation), closing the last
  // codec gap VERDICT r10 named. Each doc's seeded flat blocks are
  // encoded as a genuine THREE-SCAN progressive stream (DC first at
  // Al=1 through the real category coder, a DC refinement scan's raw
  // bits, an AC first scan's EOBn run — `Jpeg.encodeGray(progressive =
  // true)`), decoded by the full §G scan loop, and REQUIRED to equal
  // the baseline twin of the same blocks pixel-for-pixel before the
  // sums are emitted — so a wrong shift, refinement merge, EOB-run
  // count, or scan-boundary seek cannot hash-match the oracle's
  // closed-form block arithmetic (ImageIO's own progressive scan
  // scripts, with real AC refinement bits, are cross-checked in
  // JpegSpec). Partition-local end to end.
  val q201JpegProgressive: QueryDef = QueryDef.sql(
    "q201_jpeg_progressive",
    """WITH dims AS (SELECT doc_id, 1 + doc_id % 4 AS wb, 1 + doc_id % 3 AS hb
      |              FROM documents),
      |px AS (SELECT doc_id, wb, hb, i,
      |         (doc_id*41 + ((i // (8*wb)) // 8 * wb + ((i % (8*wb)) // 8)) * 13) % 256 AS p
      |       FROM dims, generate_series(0, 767) g(i) WHERE i < 64*wb*hb)
      |SELECT doc_id,
      |       CAST(MAX(wb)*8 AS INTEGER) AS width,
      |       CAST(MAX(hb)*8 AS INTEGER) AS height,
      |       CAST(3 AS INTEGER) AS n_scans,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((i+1)*p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wb = (1 + id % 4).toInt
        val hb = (1 + id % 3).toInt
        val vals = Array.tabulate(wb * hb)(b => ((id * 41 + b.toLong * 13) % 256).toInt)
        val prog = Jpeg.encodeGray(wb, hb, vals, progressive = true)
        val img = Jpeg.decode(prog).getOrElse(
          throw new IllegalStateException(s"progressive JPEG failed to decode (doc $id)"))
        val twin = Jpeg.decode(Jpeg.encodeGray(wb, hb, vals)).getOrElse(
          throw new IllegalStateException(s"baseline twin failed to decode (doc $id)"))
        require(java.util.Arrays.equals(img.pixels, twin.pixels),
          s"progressive and baseline decodes disagree (doc $id)")
        var sum = 0L
        var ck = 0L
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          sum += v
          ck = (ck + (i + 1).toLong * v) % 1000003L
          i += 1
        }
        (id, img.width, img.height, 3, sum, ck)
      }).toDF("doc_id", "width", "height", "n_scans", "pixel_sum", "checksum")
      .orderBy("doc_id")
  }

  /** A minimal EXIF APP1 segment carrying ONLY the GPS IFD (TIFF 6.0 +
    * EXIF 2.3 §4.6: "Exif\0\0" preamble, little-endian TIFF header,
    * IFD0 with the 0x8825 GPS-IFD pointer, GPS IFD with
    * LatitudeRef/Latitude/LongitudeRef/Longitude, rationals den=1).
    * Fixed 128-byte TIFF body → the whole segment is 138 bytes
    * including the FFE1 marker and its BIG-endian length (JPEG segment
    * lengths are BE even when the TIFF inside is LE — the classic
    * implementation trap [[exifGps]] must navigate).
    */
  def exifApp1Gps(latRef: Char, lat: (Int, Int, Int),
      lonRef: Char, lon: (Int, Int, Int)): Array[Byte] = {
    val tiff = java.nio.ByteBuffer.allocate(128)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42)
    tiff.putInt(8) // IFD0 offset
    tiff.putShort(1) // IFD0: one entry — the GPS IFD pointer
    tiff.putShort(0x8825.toShort).putShort(4).putInt(1).putInt(26)
    tiff.putInt(0) // next IFD
    tiff.putShort(4) // GPS IFD at 26: 4 entries
    tiff.putShort(1).putShort(2).putInt(2) // GPSLatitudeRef, ASCII in place
      .put(latRef.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    tiff.putShort(2).putShort(5).putInt(3).putInt(80) // GPSLatitude ×3 RATIONAL
    tiff.putShort(3).putShort(2).putInt(2) // GPSLongitudeRef
      .put(lonRef.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    tiff.putShort(4).putShort(5).putInt(3).putInt(104) // GPSLongitude
    tiff.putInt(0) // next IFD
    Seq(lat._1, lat._2, lat._3, lon._1, lon._2, lon._3)
      .foreach { v => tiff.putInt(v); tiff.putInt(1) }
    val payload = "Exif\u0000\u0000".getBytes("US-ASCII") ++ tiff.array()
    val len = payload.length + 2
    Array(0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload
  }

  /** Insert an APPn segment right after SOI — the position EXIF 2.3
    * mandates for APP1. */
  def withApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] =
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)

  /** Parsed GPS position: refs + degree/minute/second integers. */
  final case class GpsInfo(latRef: String, latD: Long, latM: Long, latS: Long,
      lonRef: String, lonD: Long, lonM: Long, lonS: Long)

  /** Walk a JPEG's marker segments to the APP1-Exif payload and its TIFF
    * GPS IFD; None when absent or malformed (truncated IFD, zero-den
    * rational, missing tags — every malformed-input path in the family
    * fails closed). Handles both TIFF byte orders ("II" and "MM");
    * segment lengths themselves are always big-endian per JPEG.
    */
  def exifGps(bytes: Array[Byte]): Option[GpsInfo] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return None
    def u8(o: Int): Int = bytes(o) & 0xff
    var i = 2
    while (i + 4 <= bytes.length && u8(i) == 0xff) {
      val marker = u8(i + 1)
      if (marker == 0xda || marker == 0xd9) return None // image data / EOI
      val segLen = (u8(i + 2) << 8) | u8(i + 3) // BE, includes the 2 len bytes
      if (segLen < 2 || i + 2 + segLen > bytes.length) return None
      if (marker == 0xe1 && segLen >= 2 + 6 + 8 &&
        new String(bytes, i + 4, 6, "US-ASCII") == "Exif\u0000\u0000") {
        return parseTiffGps(bytes, i + 10, segLen - 8)
      }
      i += 2 + segLen
    }
    None
  }

  private def parseTiffGps(bytes: Array[Byte], base: Int, len: Int): Option[GpsInfo] = {
    def u8(o: Int): Int = bytes(base + o) & 0xff
    val le = len >= 8 && u8(0) == 'I'.toInt && u8(1) == 'I'.toInt
    val be = len >= 8 && u8(0) == 'M'.toInt && u8(1) == 'M'.toInt
    if (!le && !be) return None
    def u16(o: Int): Int =
      if (o + 2 > len) -1
      else if (le) u8(o) | (u8(o + 1) << 8) else (u8(o) << 8) | u8(o + 1)
    def u32(o: Int): Long =
      if (o + 4 > len) -1L
      else if (le) u8(o).toLong | (u8(o + 1).toLong << 8) |
        (u8(o + 2).toLong << 16) | (u8(o + 3).toLong << 24)
      else (u8(o).toLong << 24) | (u8(o + 1).toLong << 16) |
        (u8(o + 2).toLong << 8) | u8(o + 3).toLong
    if (u16(2) != 42) return None
    val ifd0 = u32(4)
    if (ifd0 < 0 || ifd0 > Int.MaxValue) return None
    // IFD0 → the GPS IFD pointer (tag 0x8825, LONG)
    val n0 = u16(ifd0.toInt)
    if (n0 < 0) return None
    var gpsOff = -1L
    for (k <- 0 until n0) {
      val e = ifd0.toInt + 2 + 12 * k
      if (u16(e) == 0x8825 && u16(e + 2) == 4 && u32(e + 4) == 1L)
        gpsOff = u32(e + 8)
    }
    if (gpsOff < 0 || gpsOff > Int.MaxValue) return None
    val ng = u16(gpsOff.toInt)
    if (ng < 0) return None
    var latRef, lonRef: Option[String] = None
    var lat, lon: Option[(Long, Long, Long)] = None
    def rational3(off: Long): Option[(Long, Long, Long)] = {
      if (off < 0 || off + 24 > len) return None
      val v = (0 until 3).map { r =>
        val num = u32(off.toInt + 8 * r); val den = u32(off.toInt + 8 * r + 4)
        if (num < 0 || den <= 0) return None
        Math.floorDiv(num, den)
      }
      Some((v(0), v(1), v(2)))
    }
    for (k <- 0 until ng) {
      val e = gpsOff.toInt + 2 + 12 * k
      val (tag, typ, cnt) = (u16(e), u16(e + 2), u32(e + 4))
      (tag, typ) match {
        case (1, 2) | (3, 2) if cnt >= 1 && cnt <= 4 =>
          // ASCII ≤4 bytes lives in the value field itself
          val s = new String(bytes, base + e + 8, 1, "US-ASCII")
          if (tag == 1) latRef = Some(s) else lonRef = Some(s)
        case (2, 5) | (4, 5) if cnt == 3L =>
          val r = rational3(u32(e + 8))
          if (tag == 2) lat = r else lon = r
        case _ => ()
      }
    }
    for (lr <- latRef; la <- lat; nr <- lonRef; lo <- lon)
      yield GpsInfo(lr, la._1, la._2, la._3, nr, lo._1, lo._2, lo._3)
  }

  /** Remove every APP1-Exif segment from a JPEG (the standard
    * strip-metadata privacy pass — entropy-coded image data is
    * untouched, so the stripped file decodes to identical pixels).
    */
  def stripExif(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return bytes
    def u8(o: Int): Int = bytes(o) & 0xff
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    out.write(bytes, 0, 2)
    var i = 2
    var done = false
    while (!done && i + 4 <= bytes.length && u8(i) == 0xff) {
      val marker = u8(i + 1)
      if (marker == 0xda || marker == 0xd9) { done = true }
      else {
        val segLen = (u8(i + 2) << 8) | u8(i + 3)
        if (segLen < 2 || i + 2 + segLen > bytes.length) done = true
        else {
          val isExif = marker == 0xe1 && segLen >= 8 &&
            new String(bytes, i + 4, 6, "US-ASCII") == "Exif\u0000\u0000"
          if (!isExif) out.write(bytes, i, 2 + segLen)
          i += 2 + segLen
        }
      }
    }
    out.write(bytes, i, bytes.length - i) // SOS onward, untouched
    out.toByteArray
  }

  // q200 — EXIF GPS EXTRACT + STRIP: the multimodal half of q199's
  // privacy pass — camera images carry location in EXIF GPS tags, and a
  // training-data pipeline must BOTH report it (for audit/filtering)
  // and remove it before release. Each doc's seeded JPEG (q179's
  // bit-exact flat-block encoder) gets a real APP1-Exif segment
  // ([[exifApp1Gps]] — LE TIFF, IFD0 → GPS IFD, rationals) injected at
  // the spec-mandated post-SOI position; the OPERATOR then walks the
  // marker stream and the TIFF IFDs ([[exifGps]] — BE segment lengths
  // around an LE TIFF body, the classic trap), strips the segment
  // ([[stripExif]]), asserts the strip really removed it (re-parse →
  // None), and proves pixels are untouched by emitting the pixel sum of
  // the DECODED STRIPPED file against the oracle's closed-form block
  // arithmetic. bytes_removed pins the segment accounting (fixed
  // 138-byte layout). Partition-local end to end, like the whole
  // modality family.
  val q200ExifGps: QueryDef = QueryDef.sql(
    "q200_exif_gps",
    """WITH m AS (SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      |           FROM documents),
      |px AS (SELECT doc_id, SUM(64 * ((doc_id*29 + b*13) % 256)) AS pixel_sum
      |       FROM m, generate_series(0, 5) g(b) WHERE b < wb*hb GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 2 = 0 THEN 'N' ELSE 'S' END AS lat_ref,
      |  CAST(d.doc_id % 90 AS INTEGER) AS lat_d,
      |  CAST(d.doc_id % 60 AS INTEGER) AS lat_m,
      |  CAST(d.doc_id * 7 % 60 AS INTEGER) AS lat_s,
      |  CASE WHEN d.doc_id % 3 = 0 THEN 'E' ELSE 'W' END AS lon_ref,
      |  CAST(d.doc_id % 180 AS INTEGER) AS lon_d,
      |  CAST(d.doc_id * 3 % 60 AS INTEGER) AS lon_m,
      |  CAST(d.doc_id * 11 % 60 AS INTEGER) AS lon_s,
      |  CAST(138 AS INTEGER) AS bytes_removed,
      |  CAST(p.pixel_sum AS BIGINT) AS pixel_sum
      |FROM documents d JOIN px p USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wb = (1 + id % 3).toInt
        val hb = (1 + id % 2).toInt
        val jpeg = Jpeg.encodeGray(wb, hb,
          Array.tabulate(wb * hb)(b => ((id * 29 + b.toLong * 13) % 256).toInt))
        val tagged = withApp1(jpeg, exifApp1Gps(
          if (id % 2 == 0) 'N' else 'S',
          ((id % 90).toInt, (id % 60).toInt, (id * 7 % 60).toInt),
          if (id % 3 == 0) 'E' else 'W',
          ((id % 180).toInt, (id * 3 % 60).toInt, (id * 11 % 60).toInt)))
        val g = exifGps(tagged).getOrElse(
          throw new IllegalStateException(s"engine-written EXIF failed to parse (doc $id)"))
        val stripped = stripExif(tagged)
        require(exifGps(stripped).isEmpty,
          s"strip left GPS data behind (doc $id)")
        val img = Jpeg.decode(stripped).getOrElse(
          throw new IllegalStateException(s"stripped JPEG failed to decode (doc $id)"))
        var sum = 0L
        img.pixels.foreach(p => sum += (p & 0xff))
        (id, g.latRef, g.latD.toInt, g.latM.toInt, g.latS.toInt,
          g.lonRef, g.lonD.toInt, g.lonM.toInt, g.lonS.toInt,
          tagged.length - stripped.length, sum)
      }).toDF("doc_id", "lat_ref", "lat_d", "lat_m", "lat_s",
        "lon_ref", "lon_d", "lon_m", "lon_s", "bytes_removed", "pixel_sum")
      .orderBy("doc_id")
  }

  // q159 — CROSS-MODAL near-dup overlap: q22's text MinHash-LSH pairs
  // and q153's image dHash pairs, full-outer-joined on the pair and
  // classified both / text_only / image_only — the policy view a
  // multimodal curation pipeline needs before choosing a drop rule
  // (text-near-dups with different images are galleries/templates;
  // image-near-dups with different text are recaptioned reposts; only
  // 'both' is a true duplicate document). Scale: both pair kernels are
  // the already-bucketed LSH plans; the overlap join keys on the pair
  // id — near-dup mass, not corpus size. Sentinels (n_bands 0,
  // hamming −1) keep the full-outer nulls hash-comparable.
  val q159ModalityOverlap: QueryDef = QueryDef.sql(
    "q159_modality_overlap",
    s"""WITH ${Dedup.lshSigsSql},
      |tp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
      |       FROM sigs a JOIN sigs b
      |         ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2),
      |idims AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h FROM documents),
      |ig AS (SELECT doc_id, w, h, i,
      |        i - (i // w) AS j,
      |        (doc_id * 31 + i * 7) % 256 AS p0,
      |        (doc_id * 31 + (i+1) * 7) % 256 AS p1
      |      FROM idims, generate_series(0, 223) gs(i)
      |      WHERE i < w*h - 1 AND (i % w) < w - 1 AND i - (i // w) < 60),
      |ihs AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
      |         SUM(CASE WHEN p1 > p0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS dhash
      |       FROM ig GROUP BY doc_id),
      |ip AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |              bit_count(xor(a.dhash, b.dhash)) AS hamming
      |       FROM ihs a JOIN ihs b ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
      |       WHERE bit_count(xor(a.dhash, b.dhash)) <= 3)
      |SELECT COALESCE(tp.id_a, ip.id_a) AS id_a,
      |       COALESCE(tp.id_b, ip.id_b) AS id_b,
      |       CAST(COALESCE(tp.n_bands, 0) AS INTEGER) AS n_bands,
      |       CAST(COALESCE(ip.hamming, -1) AS INTEGER) AS hamming,
      |       CASE WHEN tp.id_a IS NOT NULL AND ip.id_a IS NOT NULL THEN 'both'
      |            WHEN tp.id_a IS NOT NULL THEN 'text_only'
      |            ELSE 'image_only' END AS cls
      |FROM tp FULL OUTER JOIN ip ON tp.id_a = ip.id_a AND tp.id_b = ip.id_b
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    val textPairs = Dedup.lshSigs(s, d)
      .groupBy("band", "sig")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val tp = Dedup.bucketPairs(textPairs, "ids", "id_a", "id_b")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_bands"))
    val ip = imageNeardupPairs(s, d).withColumnRenamed("hamming", "hm")
    tp.join(ip, Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        coalesce(col("n_bands"), lit(0L)).cast("int").as("n_bands"),
        coalesce(col("hm"), lit(-1)).cast("int").as("hamming"),
        when(col("n_bands").isNotNull && col("hm").isNotNull, "both")
          .when(col("n_bands").isNotNull, "text_only")
          .otherwise("image_only").as("cls"))
      .orderBy("id_a", "id_b")
  }

  // q160 — incremental IMAGE near-dup index probe: q106/q125's daily
  // admission gate for the image modality, completing the
  // modality × incremental-index matrix (text MinHash → q106, vector
  // RP-LSH → q125, image dHash → here). The corpus keeps dHash
  // signatures bucketed by (dims, band, 15-bit band value); each new
  // batch of images (doc_id % 10 = 0, so DuckDB oracles both sides
  // from one table) is decoded + hashed with ONE partition-local
  // projection and probed with an equi-join that shuffles only the
  // batch side against the bucketed index; every candidate is verified
  // with the exact popcount before it can block an admission
  // (banding makes the probe cheap, verification makes it precise —
  // q125's argument pixel-side). Resolution: most matching bands wins,
  // ties to min index id; unmatched batch docs admit as new (null
  // dup_of, sentinel counts).
  val q160ImageProbe: QueryDef = QueryDef.sql(
    "q160_image_probe",
    s"""WITH $dhashSqlCte,
      |ib AS (SELECT doc_id, w, h, k AS band, (dhash >> (15*k)) & 32767 AS bval, dhash
      |       FROM hs, generate_series(0, 3) gk(k)),
      |bb AS (SELECT * FROM ib WHERE doc_id % 10 = 0),
      |cb AS (SELECT * FROM ib WHERE doc_id % 10 <> 0),
      |m AS (SELECT b.doc_id AS doc_id, c.doc_id AS dup_of, COUNT(*) AS n_bands,
      |             bit_count(xor(b.dhash, c.dhash)) AS hamming
      |      FROM bb b JOIN cb c ON b.w = c.w AND b.h = c.h
      |                         AND b.band = c.band AND b.bval = c.bval
      |      GROUP BY 1, 2, 4),
      |ok AS (SELECT * FROM m WHERE hamming <= 3),
      |best AS (SELECT doc_id, dup_of, n_bands, hamming,
      |                row_number() OVER (PARTITION BY doc_id
      |                                   ORDER BY n_bands DESC, dup_of) AS rn
      |         FROM ok)
      |SELECT d.doc_id, b.dup_of,
      |       CAST(COALESCE(b.n_bands, 0) AS INTEGER) AS n_bands,
      |       CAST(COALESCE(b.hamming, -1) AS INTEGER) AS hamming
      |FROM (SELECT DISTINCT doc_id FROM bb) d
      |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hs = dhashRows(s, d).toDF("doc_id", "width", "height", "dhash")
    def bandsOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("width"), col("height"), col("dhash"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("dhash"), 15 * b).bitwiseAND(lit(32767L)).as("bval"))): _*)).as("bk"))
      .select(col("doc_id"), col("width"), col("height"), col("dhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
    val batch = hs.filter(col("doc_id") % 10 === 0)
    val index = bandsOf(hs.filter(col("doc_id") % 10 =!= 0))
    val matches = bandsOf(batch).alias("b")
      .join(index.alias("c"),
        col("b.width") === col("c.width") && col("b.height") === col("c.height") &&
          col("b.band") === col("c.band") && col("b.bval") === col("c.bval"))
      .select(col("b.doc_id").as("doc_id"), col("c.doc_id").as("dup_of"),
        col("b.dhash").as("hb"), col("c.dhash").as("hc"))
      .groupBy("doc_id", "dup_of", "hb", "hc").agg(count(lit(1)).as("n_bands"))
      .withColumn("hamming", bit_count(col("hb").bitwiseXOR(col("hc"))).cast("int"))
      .filter(col("hamming") <= 3)
    val win = Window.partitionBy("doc_id").orderBy(col("n_bands").desc, col("dup_of"))
    val best = matches.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
    batch.select(col("doc_id"))
      .join(best.select(col("doc_id"), col("dup_of"), col("n_bands"), col("hamming")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        coalesce(col("n_bands"), lit(0L)).cast("int").as("n_bands"),
        coalesce(col("hamming"), lit(-1)).cast("int").as("hamming"))
      .orderBy("doc_id")
  }

  /** q179/q180's raster: each doc's id seeds a FLAT-8×8-BLOCK gray
    * image rendered to a genuine baseline JPEG ([[Jpeg.encodeGray]] —
    * unit quant table makes the lossy format bit-exact on flat blocks,
    * see the codec doc) and decoded back by the full baseline decoder
    * ([[Jpeg.decode]]: marker walk, canonical Huffman, dequant, IDCT).
    * Every 4th doc adds DRI/RSTn restarts, so the restart machinery is
    * on the oracle gate, not just in JpegSpec. Partition-local end to
    * end, like the PNG twin.
    */
  private def jpegRows(s: SparkSession, d: String): Dataset[(Long, Int, Int, Long)] = {
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wb = (1 + id % 3).toInt
        val hb = (1 + id % 2).toInt
        val vals = Array.tabulate(wb * hb)(b => ((id * 37 + b.toLong * 11) % 256).toInt)
        val ri = if (id % 4 == 0) 2 else 0
        val img = Jpeg.decode(Jpeg.encodeGray(wb, hb, vals, ri)).getOrElse(
          throw new IllegalStateException(s"engine-encoded JPEG failed to decode (doc $id)"))
        (id, img.width, img.height, dHash(img))
      })
  }

  /** The closed-form pixel of [[jpegRows]]' raster at row-major index
    * `i`: block (x/8, y/8)'s value — shared by both JPEG oracles.
    */
  private def jpegPixelSql(i: String): String =
    s"(doc_id*37 + (($i // (8*wb)) // 8 * wb + (($i % (8*wb)) // 8)) * 11) % 256"

  // q179 — REAL JPEG decode on the oracle path: q148's discipline for
  // the format most web images actually use. The sums are computed from
  // the DECODER'S output bytes, so a wrong Huffman table build, DC
  // prediction, restart resync, dequant, IDCT, or marker walk cannot
  // hash-match the oracle's closed-form block arithmetic.
  val q179JpegDecode: QueryDef = QueryDef.sql(
    "q179_jpeg_decode",
    s"""WITH dims AS (SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      |              FROM documents),
      |px AS (SELECT doc_id, wb, hb, i, ${jpegPixelSql("i")} AS p
      |       FROM dims, generate_series(0, 383) g(i) WHERE i < 64*wb*hb)
      |SELECT doc_id,
      |       CAST(MAX(wb)*8 AS INTEGER) AS width,
      |       CAST(MAX(hb)*8 AS INTEGER) AS height,
      |       CAST(1 AS INTEGER) AS channels,
      |       CAST(SUM(p) AS BIGINT) AS pixel_sum,
      |       CAST(SUM((i+1)*p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val wb = (1 + id % 3).toInt
        val hb = (1 + id % 2).toInt
        val vals = Array.tabulate(wb * hb)(b => ((id * 37 + b.toLong * 11) % 256).toInt)
        val ri = if (id % 4 == 0) 2 else 0
        val img = Jpeg.decode(Jpeg.encodeGray(wb, hb, vals, ri)).getOrElse(
          throw new IllegalStateException(s"engine-encoded JPEG failed to decode (doc $id)"))
        var sum = 0L; var ck = 0L; var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          sum += v
          ck = (ck + (i + 1).toLong * v) % 1000003L
          i += 1
        }
        (id, img.width, img.height, img.channels, sum, ck)
      }).toDF("doc_id", "width", "height", "channels", "pixel_sum", "checksum")
      .orderBy("doc_id")
  }

  // q180 — perceptual dedup over DECODED JPEG pixels: the q152 bucket
  // shape (dims + dHash signature → canonical representative + bucket
  // size) fed by the JPEG codec instead of PNG — the round-11 close of
  // VERDICT r10's top gap ("the perceptual-dedup path currently only
  // works on PNG pixels"). Same scale shape: decode + hash are a
  // partition-local projection, the only shuffle is ONE window keyed
  // by the bucket.
  val q180JpegDhash: QueryDef = QueryDef.sql(
    "q180_jpeg_dhash",
    s"""WITH dims AS (SELECT doc_id, 1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb
      |              FROM documents),
      |g AS (SELECT doc_id, wb*8 AS w, hb*8 AS h, i, i - (i // (wb*8)) AS j,
      |        ${jpegPixelSql("i")} AS p0,
      |        ${jpegPixelSql("(i+1)")} AS p1
      |      FROM dims, generate_series(0, 383) gs(i)
      |      WHERE i < 64*wb*hb - 1 AND (i % (wb*8)) < wb*8 - 1
      |        AND i - (i // (wb*8)) < 60),
      |hs AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h,
      |         SUM(CASE WHEN p1 > p0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS dhash
      |       FROM g GROUP BY doc_id)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |       CAST(dhash AS BIGINT) AS dhash,
      |       CAST(MIN(doc_id) OVER (PARTITION BY w, h, dhash) AS BIGINT) AS canonical_id,
      |       CAST(COUNT(*) OVER (PARTITION BY w, h, dhash) AS BIGINT) AS bucket_size
      |FROM hs ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy("width", "height", "dhash")
    jpegRows(s, d).toDF("doc_id", "width", "height", "dhash")
      .select(col("doc_id"), col("width"), col("height"), col("dhash"),
        min("doc_id").over(win).as("canonical_id"),
        count(lit(1)).over(win).as("bucket_size"))
      .orderBy("doc_id")
  }

  // q183 — REAL GIF decode on the oracle path, completing the image
  // trio (q148 PNG, q179 JPEG): each doc's seeded gray raster is
  // LZW-compressed into a genuine single-frame GIF89a ([[Gif.encodeGray]]
  // — GIF is lossless over its palette, so unlike JPEG no flat-block
  // trick is needed: ANY raster round-trips bit-exactly) and decoded by
  // the full block-stream walk + variable-width LZW + palette resolve
  // ([[Gif.decode]]); every 3rd doc writes INTERLACED, putting the
  // 4-pass reorder on the gate. Sums are over the decoder's RED channel
  // (gray palette ⇒ r = g = b); a wrong code width, dictionary reset,
  // KwKwK case, sub-block framing, or interlace pass cannot hash-match
  // the closed-form arithmetic. Partition-local end to end.
  val q183GifDecode: QueryDef = QueryDef.sql(
    "q183_gif_decode",
    """WITH dims AS (SELECT doc_id, 5 + doc_id % 12 AS w, 4 + doc_id % 9 AS h
      |              FROM documents),
      |px AS (SELECT doc_id, w, h, i, (doc_id*23 + i*13) % 256 AS p
      |       FROM dims, generate_series(0, 191) g(i) WHERE i < w*h)
      |SELECT doc_id,
      |       CAST(MAX(w) AS INTEGER) AS width,
      |       CAST(MAX(h) AS INTEGER) AS height,
      |       CAST(3 AS INTEGER) AS channels,
      |       CAST(SUM(p) AS BIGINT) AS red_sum,
      |       CAST(SUM((i+1)*p) % 1000003 AS BIGINT) AS checksum
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (5 + id % 12).toInt
        val h = (4 + id % 9).toInt
        val px = Array.tabulate(w * h)(i => ((id * 23 + i.toLong * 13) % 256).toByte)
        val img = Gif.decode(Gif.encodeGray(w, h, px, interlaced = id % 3 == 0))
          .getOrElse(
            throw new IllegalStateException(s"engine-encoded GIF failed to decode (doc $id)"))
        var sum = 0L; var ck = 0L; var i = 0
        while (i < w * h) {
          val v = img.pixels(3 * i) & 0xff // red channel; gray palette
          sum += v
          ck = (ck + (i + 1).toLong * v) % 1000003L
          i += 1
        }
        (id, img.width, img.height, img.channels, sum, ck)
      }).toDF("doc_id", "width", "height", "channels", "red_sum", "checksum")
      .orderBy("doc_id")
  }

  // q207 — SCENE-CUT detection (the video-curation segmentation every
  // clip pipeline runs before captioning/sampling: a "video" is really a
  // sequence of scenes, and frame sampling, dedup, and caption alignment
  // all want scene boundaries, not raw frame indices). Each doc's seeded
  // clip holds scenes of length 2 + id%3; frames within a scene are
  // pixel-identical, the pattern switches at scene boundaries (the
  // synthetic stand-in for a hard cut). The operator is the real
  // pipeline: AVI container walk → PNG-decode EVERY frame → per-frame
  // dHash → Hamming distance between CONSECUTIVE frames → cut where
  // distance exceeds q153's τ=3 (within-scene distance is 0 by
  // construction; a cross-scene pair may legitimately hash close and go
  // undetected — the detector's τ semantics, replayed identically by the
  // oracle's closed-form dHash CTE, so a miss cannot hash-mismatch).
  // Scale shape: decode + hash + the consecutive-distance fold are all
  // doc-local inside one mapPartitions — ZERO shuffles; at 100 TB this
  // is an embarrassingly parallel scan of the video corpus.
  val q207SceneCuts: QueryDef = QueryDef.sql(
    "q207_scene_cuts",
    """WITH m AS (SELECT doc_id, 6 + doc_id % 7 AS n, 4 + doc_id % 5 AS w,
      |                  3 + doc_id % 4 AS h, 2 + doc_id % 3 AS L
      |           FROM documents),
      |fr AS (SELECT doc_id, w, h, L, f FROM m, generate_series(0, 12) g(f)
      |       WHERE f < n),
      |g AS (SELECT doc_id, f, i, i - (i // w) AS j,
      |        (doc_id*31 + ((f // L)+1)*(i*i*7 + i*11)) % 256 AS p0,
      |        (doc_id*31 + ((f // L)+1)*((i+1)*(i+1)*7 + (i+1)*11)) % 256 AS p1
      |      FROM fr, generate_series(0, 47) gi(i)
      |      WHERE i < w*h - 1 AND (i % w) < w - 1 AND i - (i // w) < 60),
      |hs AS (SELECT doc_id, f,
      |         SUM(CASE WHEN p1 > p0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS dh
      |       FROM g GROUP BY 1, 2),
      |dl AS (SELECT doc_id, f,
      |         bit_count(xor(dh, lag(dh) OVER (PARTITION BY doc_id ORDER BY f))) AS ham
      |       FROM hs),
      |c AS (SELECT doc_id, COUNT(*) AS n_cuts,
      |             string_agg(CAST(f AS VARCHAR), ',' ORDER BY f) AS cut_frames
      |      FROM dl WHERE ham > 3 GROUP BY 1)
      |SELECT m.doc_id, CAST(m.n AS INTEGER) AS n_frames,
      |       CAST(COALESCE(c.n_cuts, 0) AS INTEGER) AS n_cuts,
      |       COALESCE(c.cut_frames, '') AS cut_frames
      |FROM m LEFT JOIN c ON m.doc_id = c.doc_id
      |ORDER BY m.doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (6 + id % 7).toInt
        val w = (4 + id % 5).toInt
        val h = (3 + id % 4).toInt
        val sceneLen = (2 + id % 3).toInt
        val rendered = (0 until n).map { f =>
          val scene = f / sceneLen
          // quadratic, scene-SCALED pattern: a hard cut must flip many
          // brightness orderings (a mere additive offset shifts only the
          // gradient's wrap point — ~1 dHash bit, invisible at τ=3)
          Png.encode(w, h, 1, Array.tabulate(w * h)(i =>
            ((id * 31 + (scene + 1L) * (i.toLong * i * 7 + i * 11L)) % 256).toByte))
        }
        val (declared, frames) = aviFrames(aviBytes(rendered, w, h)).getOrElse(
          throw new IllegalStateException(s"engine-rendered AVI failed to parse (doc $id)"))
        val hashes = frames.map { bytes =>
          dHash(Png.decode(bytes).getOrElse(
            throw new IllegalStateException(s"frame failed to decode (doc $id)")))
        }
        val cuts = (1 until declared).filter(f =>
          java.lang.Long.bitCount(hashes(f) ^ hashes(f - 1)) > 3)
        (id, declared, cuts.size, cuts.mkString(","))
      }).toDF("doc_id", "n_frames", "n_cuts", "cut_frames")
      .orderBy("doc_id")
  }

  // q208 — VOICE-ACTIVITY segmentation (the VAD pass a speech-corpus
  // pipeline runs before ASR/alignment: which stretches of the recording
  // carry speech, how many utterances, how much total silence to trim).
  // Each doc's seeded telephony clip alternates 64-sample speech bursts
  // (|v| ≥ 4096) and near-silence windows (|v| < 64) chosen by
  // (doc_id + window) % 3; the clip round-trips the REAL G.711 µ-law
  // path (q196's encoder → format-tag-7 WAV → RIFF walk → expansion), so
  // the energies below are over the LOSSY decoded magnitudes, and the
  // oracle replays the companding quantization itself in integer SQL — a
  // wrong segment threshold or bias shifts frame energies and cannot
  // hash-match. VAD: 64-sample frames (aligned with the burst grid; the
  // partial tail frame inherits its window's class), voiced iff
  // energy > 1024·n_samples (integer mean test, division-free), segments
  // = maximal voiced runs via a lag edge count. Scale shape: everything
  // is doc-local inside one mapPartitions — zero shuffles.
  val q208AudioVad: QueryDef = QueryDef.sql(
    "q208_audio_vad",
    """WITH s AS (SELECT doc_id, i, i // 64 AS f,
      |             (CASE WHEN i % 2 = 0 THEN 1 ELSE -1 END) *
      |             (CASE WHEN (doc_id + i // 64) % 3 = 0
      |                   THEN (doc_id*13 + i*101) % 64
      |                   ELSE 4096 + (doc_id*17 + i*12289) % 24576 END) AS v
      |           FROM documents, generate_series(0, 499) g(i)
      |           WHERE i < 200 + doc_id % 300),
      |e AS (SELECT doc_id, i, f, v,
      |             CASE WHEN LEAST(ABS(v), 32635) + 132 >= 16384 THEN 7
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 8192 THEN 6
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 4096 THEN 5
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 2048 THEN 4
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 1024 THEN 3
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 512 THEN 2
      |                  WHEN LEAST(ABS(v), 32635) + 132 >= 256 THEN 1
      |                  ELSE 0 END AS seg
      |      FROM s),
      |q AS (SELECT doc_id, i, f,
      |             (CASE WHEN v < 0 THEN -1 ELSE 1 END) *
      |             ((((((LEAST(ABS(v), 32635) + 132) >> (seg + 3)) & 15)
      |                * 8 + 132) << seg) - 132) AS dv
      |      FROM e),
      |fr AS (SELECT doc_id, f, COUNT(*) AS ns, SUM(ABS(dv)) AS energy
      |       FROM q GROUP BY 1, 2),
      |vd AS (SELECT doc_id, f, ns, energy,
      |              CASE WHEN energy > 1024 * ns THEN 1 ELSE 0 END AS voiced
      |       FROM fr),
      |sg AS (SELECT doc_id, f, voiced,
      |              CASE WHEN voiced = 1 AND COALESCE(
      |                LAG(voiced) OVER (PARTITION BY doc_id ORDER BY f), 0) = 0
      |                   THEN 1 ELSE 0 END AS st
      |       FROM vd)
      |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
      |       CAST(SUM(voiced) AS INTEGER) AS n_voiced,
      |       CAST(SUM(st) AS INTEGER) AS n_segments,
      |       string_agg(CAST(voiced AS VARCHAR), '' ORDER BY f) AS voiced_mask
      |FROM sg GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (200 + id % 300).toInt
        val pcm = Array.tabulate(n) { i =>
          val sign = if (i % 2 == 0) 1 else -1
          val mag =
            if ((id + i / 64) % 3 == 0) (id * 13 + i.toLong * 101) % 64
            else 4096 + (id * 17 + i.toLong * 12289) % 24576
          (sign * mag).toShort
        }
        val wav = wavBytesMulaw(pcm.map(mulawEncode), 8000)
        val dec = wavMulaw(wav).getOrElse(
          throw new IllegalStateException(s"engine-rendered G.711 WAV failed to parse (doc $id)"))
          .map(mulawDecode)
        val nFrames = (dec.length + 63) / 64
        val voiced = (0 until nFrames).map { f =>
          val lo = f * 64
          val hi = math.min(lo + 64, dec.length)
          var energy = 0L
          var i = lo
          while (i < hi) { energy += math.abs(dec(i).toLong); i += 1 }
          energy > 1024L * (hi - lo)
        }
        val nSegments = (0 until nFrames).count(f =>
          voiced(f) && (f == 0 || !voiced(f - 1)))
        (id, nFrames, voiced.count(identity), nSegments,
          voiced.map(v => if (v) "1" else "0").mkString)
      }).toDF("doc_id", "n_frames", "n_voiced", "n_segments", "voiced_mask")
      .orderBy("doc_id")
  }

  // q220 — AUDIO RESAMPLE (8 kHz → 16 kHz upsample by exact linear
  // interpolation — the sample-rate normalization every speech corpus
  // runs before a fixed-rate model; the audio sibling of q149's pixel
  // resize): out[2i] = in[i], out[2i+1] = midpoint of the neighbors,
  // computed in OFFSET space (+32768 lifts the sum nonnegative, so both
  // engines' integer division is plain truncation — Spark's `div`
  // truncates toward zero while DuckDB's `//` floors, and negative
  // midpoints would silently diverge by one; the offset kills the trap
  // instead of documenting it). The resampled signal round-trips the
  // real 16 kHz WAV writer/parser before the stats, so header fields
  // and sample packing are exercised, not just arithmetic.
  // Partition-local end to end — zero shuffles.
  val q220AudioResample: QueryDef = QueryDef.sql(
    "q220_audio_resample",
    """WITH m AS (SELECT doc_id, 100 + doc_id % 200 AS n FROM documents),
      |s AS (SELECT doc_id, n, i, ((doc_id*17 + i*12289) % 65536) - 32768 AS v
      |      FROM m, generate_series(0, 299) g(i) WHERE i < n),
      |s2 AS (SELECT doc_id, n, i, v,
      |         LEAD(v) OVER (PARTITION BY doc_id ORDER BY i) AS nv FROM s),
      |o AS (SELECT doc_id, n, 2*i AS j, v AS w FROM s2
      |      UNION ALL
      |      SELECT doc_id, n, 2*i + 1 AS j,
      |             ((v + 32768) + (nv + 32768)) // 2 - 32768 AS w
      |      FROM s2 WHERE nv IS NOT NULL)
      |SELECT doc_id, CAST(MAX(n) AS INTEGER) AS n_in,
      |       CAST(COUNT(*) AS INTEGER) AS n_out,
      |       CAST(SUM(ABS(w)) AS BIGINT) AS sum_abs,
      |       CAST(SUM((j + 1) * ABS(w)) % 1000003 AS BIGINT) AS checksum
      |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (100 + id % 200).toInt
        val in = Array.tabulate(n)(i =>
          (((id * 17 + i.toLong * 12289) % 65536) - 32768).toShort)
        val out = new Array[Short](2 * n - 1)
        var i = 0
        while (i < n) {
          out(2 * i) = in(i)
          if (i + 1 < n)
            out(2 * i + 1) =
              (((in(i) + 32768) + (in(i + 1) + 32768)) / 2 - 32768).toShort
          i += 1
        }
        val dec = wavPcm16(wavBytes(out, 16000)).getOrElse(
          throw new IllegalStateException(s"resampled WAV failed to parse (doc $id)"))
        require(dec.length == out.length, s"sample count changed in WAV round-trip (doc $id)")
        var sumAbs = 0L
        var ck = 0L
        var j = 0
        while (j < dec.length) {
          val a = math.abs(dec(j).toLong)
          sumAbs += a
          ck = (ck + (j + 1).toLong * a) % 1000003L
          j += 1
        }
        (id, n, dec.length, sumAbs, ck)
      }).toDF("doc_id", "n_in", "n_out", "sum_abs", "checksum")
      .orderBy("doc_id")
  }

  // q221 — IMAGE CONVOLUTION (3×3 integer Laplacian over DECODED pixels
  // — the edge/feature kernel under every classic vision preprocessing
  // pass, and the per-pixel-neighborhood compute shape q149's resize and
  // q152's dHash don't exercise): each doc's raster round-trips the real
  // PNG codec, the interior ("valid") region is convolved with
  // [0,−1,0; −1,4,−1; 0,−1,0], and the gate emits edge-pixel counts
  // (|resp| > 64), total response mass, and a position-weighted checksum
  // — all integer-exact, replayed by the oracle directly from the pixel
  // formula's neighborhood arithmetic. Border semantics are explicit:
  // valid-only (no padding invention). Partition-local end to end.
  val q221ImageConv: QueryDef = QueryDef.sql(
    "q221_image_conv",
    """WITH dims AS (SELECT doc_id, 4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
      |              FROM documents),
      |px AS (SELECT doc_id, w, h, k, k % (w-2) + 1 AS x, k // (w-2) + 1 AS y
      |       FROM dims, generate_series(0, 159) g(k)
      |       WHERE k < (w-2) * (h-2)),
      |r AS (SELECT doc_id, x, y, w, h,
      |        4*((doc_id*31 + (y*w+x)*7) % 256)
      |        - ((doc_id*31 + (y*w+x-1)*7) % 256)
      |        - ((doc_id*31 + (y*w+x+1)*7) % 256)
      |        - ((doc_id*31 + ((y-1)*w+x)*7) % 256)
      |        - ((doc_id*31 + ((y+1)*w+x)*7) % 256) AS resp
      |      FROM px)
      |SELECT doc_id,
      |       CAST(COUNT(*) AS INTEGER) AS n_interior,
      |       CAST(COUNT(*) FILTER (ABS(resp) > 64) AS INTEGER) AS edge_count,
      |       CAST(SUM(ABS(resp)) AS BIGINT) AS sum_abs_resp,
      |       CAST(SUM(((y-1)*(w-2) + x) * ABS(resp)) % 1000003 AS BIGINT)
      |         AS checksum
      |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = (4 + id % 13).toInt
        val h = (3 + id % 11).toInt
        val img = Png.decode(Png.encode(w, h, 1,
          Array.tabulate(w * h)(i => ((id * 31 + i.toLong * 7) % 256).toByte)))
          .getOrElse(throw new IllegalStateException(s"PNG round-trip failed (doc $id)"))
        def p(x: Int, y: Int): Int = img.pixels(y * w + x) & 0xff
        var nInt = 0
        var edges = 0
        var sumAbs = 0L
        var ck = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val resp = 4 * p(x, y) - p(x - 1, y) - p(x + 1, y) - p(x, y - 1) - p(x, y + 1)
            val a = math.abs(resp).toLong
            nInt += 1
            if (a > 64) edges += 1
            sumAbs += a
            ck = (ck + ((y - 1) * (w - 2) + x).toLong * a) % 1000003L
            x += 1
          }
          y += 1
        }
        (id, nInt, edges, sumAbs, ck)
      }).toDF("doc_id", "n_interior", "edge_count", "sum_abs_resp", "checksum")
      .orderBy("doc_id")
  }

  /** 8-point Walsh-Hadamard transform, natural (Hadamard) order:
    * coef(k) = Σ_j (−1)^popcount(k & j) · frame(j). Integer-exact
    * (|coef| ≤ 8·32768 < 2^19), involutive up to the factor 8
    * (H·H = 8·I — pinned by MultimodalSpec's Parseval check), and the
    * cheapest orthogonal transform whose coefficient SIGNS survive
    * small distortions — which is what makes the sign vector a robust
    * audio hash (the Haitsma-Kalker construction with WHT bands).
    */
  def wht8(frame: Array[Int]): Array[Int] =
    Array.tabulate(8) { k =>
      var acc = 0
      var j = 0
      while (j < 8) {
        val v = frame(j)
        acc += (if (java.lang.Integer.bitCount(k & j) % 2 == 0) v else -v)
        j += 1
      }
      acc
    }

  // q237 — AUDIO FINGERPRINT (robust hash over WHT sign codes — the
  // Haitsma-Kalker industrial audio-dedup construction, with the 8-point
  // Walsh-Hadamard transform as the integer-exact band decomposition;
  // completes the perceptual-hash triad: q152 dHash for images, q207
  // scene signatures for video, this for audio): each doc's seeded PCM16
  // signal round-trips the REAL WAV writer/parser, is cut into
  // non-overlapping 8-sample frames, and each frame becomes a 7-bit code
  // — the signs of AC coefficients 1..7 (DC excluded: level-invariance;
  // coef = 0 pins to sign 0). Near-identical audio produces matching
  // code streams, so exact dedup machinery (q21's hash-groupBy) applies
  // to audio verbatim. Everything is integer arithmetic, so the oracle
  // replays transform, signs, and packing bit-exactly from the sample
  // formula ((−1)^popcount(k&j) as a bit_count parity CASE).
  // Partition-local end to end — zero shuffles.
  val q237AudioFingerprint: QueryDef = QueryDef.sql(
    "q237_audio_fingerprint",
    """WITH m AS (SELECT doc_id, 128 + doc_id % 128 AS n FROM documents),
      |s AS (SELECT doc_id, n, i, ((doc_id*17 + i*12289) % 65536) - 32768 AS v
      |      FROM m, generate_series(0, 255) g(i) WHERE i < n),
      |fr AS (SELECT doc_id, i // 8 AS f, i % 8 AS j, v FROM s
      |       WHERE i < (n // 8) * 8),
      |co AS (SELECT doc_id, f, k,
      |         SUM(CASE WHEN bit_count(CAST(k AS BIGINT) & j) % 2 = 0
      |                  THEN v ELSE -v END) AS coef
      |       FROM fr, generate_series(1, 7) gk(k) GROUP BY 1, 2, 3),
      |code AS (SELECT doc_id, f,
      |           SUM(CASE WHEN coef > 0 THEN 1 << (k-1) ELSE 0 END) AS c
      |         FROM co GROUP BY 1, 2)
      |SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_frames,
      |       CAST(COUNT(DISTINCT c) AS INTEGER) AS n_codes,
      |       CAST(SUM((f + 1) * c) % 1000003 AS BIGINT) AS checksum
      |FROM code GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    Tables.widen(Tables.documents(s, d)).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = (128 + id % 128).toInt
        val in = Array.tabulate(n)(i =>
          (((id * 17 + i.toLong * 12289) % 65536) - 32768).toShort)
        val dec = wavPcm16(wavBytes(in, 8000)).getOrElse(
          throw new IllegalStateException(s"WAV round-trip failed (doc $id)"))
        require(dec.length == n, s"sample count changed in WAV round-trip (doc $id)")
        val nFrames = n / 8
        val codes = Array.tabulate(nFrames) { f =>
          val coefs = wht8(Array.tabulate(8)(j => dec(8 * f + j).toInt))
          var c = 0
          var k = 1
          while (k < 8) {
            if (coefs(k) > 0) c |= 1 << (k - 1)
            k += 1
          }
          c
        }
        var ck = 0L
        var f = 0
        while (f < nFrames) {
          ck = (ck + (f + 1).toLong * codes(f)) % 1000003L
          f += 1
        }
        (id, nFrames, codes.distinct.length, ck)
      }).toDF("doc_id", "n_frames", "n_codes", "checksum")
      .orderBy("doc_id")
  }

  // q250 — the MULTIMODAL CURATE COMPOSITION (q139's end-to-end proof,
  // for images): quality gate (area + texture — a near-constant raster
  // has dhash popcount < 2) → EXACT dedup (q152's canonical-per-bucket
  // rule) → NEAR-dup prune among the canonicals (q153's banded-Hamming
  // kernel fed ONLY survivors — the dominated copies never enter the
  // band shuffle; τ=3 pigeonhole keeps the banding lossless, so the
  // all-pairs oracle replays it bit-for-bit) → shard scatter with
  // per-shard counts/pixels/signature checksums. One DuckDB twin
  // hash-checks the WHOLE chain — a wrong gate threshold, a lost
  // canonical, an over- or under-pruned near-dup, or a misplaced shard
  // all mismatch. Scale shape: decode+hash partition-local, one window
  // for exact dedup, band-keyed shuffle over CANONICALS only, one
  // shard agg — strictly cheaper than running q152+q153 separately.
  val q250ImageCurate: QueryDef = QueryDef.sql(
    "q250_image_curate",
    s"""WITH $dhashSqlCte,
      |g2 AS (SELECT doc_id, w, h, dhash FROM hs
      |       WHERE w*h >= 20 AND bit_count(dhash) >= 2),
      |canon AS (SELECT doc_id, w, h, dhash FROM (
      |    SELECT g2.*, MIN(doc_id) OVER (PARTITION BY w, h, dhash) AS cid
      |    FROM g2) WHERE doc_id = cid),
      |dropped AS (SELECT DISTINCT b.doc_id
      |            FROM canon a JOIN canon b
      |              ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
      |             AND bit_count(xor(a.dhash, b.dhash)) <= 3),
      |fin AS (SELECT * FROM canon
      |        WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
      |SELECT doc_id % 8 AS shard, CAST(COUNT(*) AS BIGINT) AS n_images,
      |       CAST(SUM(w*h) AS BIGINT) AS total_pixels,
      |       CAST(SUM(dhash % 1000003) % 1000003 AS BIGINT) AS hash_checksum,
      |       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
      |       CAST(MAX(doc_id) AS BIGINT) AS max_doc
      |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val hashes = dhashRows(s, d).toDF("doc_id", "width", "height", "dhash")
    val gated = hashes.filter(
      col("width") * col("height") >= 20 && bit_count(col("dhash")) >= 2)
    val win = Window.partitionBy("width", "height", "dhash")
    val canon = gated
      .withColumn("cid", min("doc_id").over(win))
      .filter(col("doc_id") === col("cid")).drop("cid")
    val dropped = bandedNeardupPairs(canon)
      .select(col("id_b").as("doc_id")).distinct()
    canon.join(dropped, Seq("doc_id"), "left_anti")
      .groupBy((col("doc_id") % 8).as("shard"))
      .agg(count(lit(1)).as("n_images"),
        sum(col("width").cast("long") * col("height")).as("total_pixels"),
        // per-row mod BEFORE the sum: a 60-bit dhash summed over a
        // corpus-sized shard overflows Long (ANSI throws); (Σx) mod p
        // = (Σ x mod p) mod p keeps every partial in range
        (sum(col("dhash") % 1000003L) % 1000003L).as("hash_checksum"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("shard")
  }

  // declared LAST: a val Seq referencing a val defined later in the
  // object would capture null at init (the Scala object-init trap)
  val all: Seq[QueryDef] = Seq(
    q31MultimodalDecode, q59MediaResize, q60FrameSample, q61MediaFeatures,
    q140AudioMeta, q148PngDecode, q149PixelResize, q152ImageDhash,
    q153ImageNeardup, q154AudioFrames, q155VideoFrames, q159ModalityOverlap,
    q160ImageProbe, q179JpegDecode, q180JpegDhash, q183GifDecode,
    q195VideoMjpeg, q196AudioMulaw, q200ExifGps, q201JpegProgressive,
    q203AvInterleave, q207SceneCuts, q208AudioVad, q220AudioResample,
    q221ImageConv, q237AudioFingerprint, q250ImageCurate)
}

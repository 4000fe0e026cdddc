package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.engine.{QueryDef, Tables}

/** Multimodal column plumbing [EXT, north star]: media (image/audio/video)
  * travels the lake as an opaque `binary` column plus a typed metadata
  * struct. Decode / feature-extraction runs as a *partition-local* typed
  * transformation (`mapPartitions`) so a real decoder would amortize its
  * native-library setup once per partition, not once per row, and batch
  * size = partition size is controlled by the usual split knobs
  * (`spark.sql.files.maxPartitionBytes`).
  *
  * The decoder itself is a STUB (no image/audio libs in this container —
  * deterministic arithmetic over the byte payload stands in for decode),
  * but everything Spark-side is real: the binary schema, the typed
  * Dataset boundary, the per-partition batching shape, and the metadata
  * contract a downstream pipeline would join against.
  */
object Multimodal {

  /** A media blob as stored in the lake. */
  final case class MediaBlob(doc_id: Long, blob: Array[Byte])

  /** Decoded media metadata (what a real image decoder would emit). */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** Stub decode: deterministic pure-arithmetic stand-in for an image
    * header parse. Byte-length driven so the DuckDB oracle can replicate
    * it (`octet_length`), which keeps the *plumbing* on the verify path
    * even though the decode itself is fake.
    */
  def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.blob.length
    // long arithmetic: n * 7 overflows Int for blobs > ~306 MB, and the
    // oracle computes in BIGINT
    MediaMeta(b.doc_id, n, n % 1024, (n.toLong * 7 % 768).toInt, n % 30 + 1)
  }

  /** The decode operator: binary blobs → typed metadata, batched per
    * partition. This is where a real pipeline would call into the native
    * decoder with the partition's blobs as one batch.
    */
  def decode(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
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

  val all: Seq[QueryDef] = Seq(q31MultimodalDecode)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise via `mapPartitions` over a
  * typed Dataset (the Scala analog of `mapInPandas`: one iterator per
  * partition, records streamed, no whole-partition materialization).
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs, so
  * `decodeStub` derives deterministic fake features (dimensions, frame
  * count, content hash) from the raw bytes. The Spark-side plumbing is real:
  * binary payload column, metadata struct, partition-streamed batch decode,
  * and a downstream relational aggregation over the extracted features. At
  * scale the payload column stays columnar parquet/binaryFile and the decode
  * runs once per partition batch with zero shuffle.
  */
object MultimodalOps {

  case class MediaIn(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           width: Long, height: Long, n_frames: Long, content_hash: Long)

  /** Deterministic fake "decode": dimensions/frames derived from a 64-bit
    * FNV-1a over the payload. Replace with a real codec where available. */
  private[graft] def decodeStub(m: MediaIn): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < m.payload.length) { h ^= (m.payload(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    val w = 64 + math.floorMod(h, 960)
    val ht = 64 + math.floorMod(h >>> 17, 960)
    val frames = m.kind match {
      case "video" => 1 + math.floorMod(h >>> 31, 240)
      case "audio" => 1 + math.floorMod(h >>> 31, 48000)
      case _       => 1L
    }
    MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong, w, ht, frames, h)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full multimodal pipeline: synthesize binary payloads from documents
    // (text bytes stand in for media blobs), decode per partition batch,
    // project typed features. Rows-only check (decode is engine-specific).
    "q70_media_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables.load(s, d, "documents")
        .select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("payload"))
        .as[MediaIn]
      media
        .mapPartitions(_.map(decodeStub))
        .toDF()
        .orderBy("doc_id")
    }),

    // Downstream relational aggregation over extracted features — shows the
    // decode output is a first-class DataFrame for the usual operator set.
    "q71_media_stats" -> ((s, d) => {
      import s.implicits._
      val media = Tables.load(s, d, "documents")
        .select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int")).as("kind"),
          col("text").cast("binary").as("payload"))
        .as[MediaIn]
      media.mapPartitions(_.map(decodeStub)).toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          round(avg("width"), 4).as("avg_width"),
          max("n_frames").as("max_frames"))
        .orderBy("kind")
    }))

  /** q71 is oracle-checkable in the aggregate because n_bytes == n_chars for
    * ASCII payloads and kind is a pure function of doc_id — the per-kind
    * counts and byte totals are SQL-derivable even though decode is not. */
  val oracleSql: Map[String, String] = Map.empty
}

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
  *
  * The fake features hash through [[graft.plans.Md5Lower64]] (= DuckDB
  * `md5_number_lower`), masked to 63 bits so every derived value is
  * non-negative modular arithmetic on both engines — q70 AND q71 are fully
  * hash-checked by the SQL oracle, decode stub included.
  */
object MultimodalOps {

  case class MediaIn(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                           width: Long, height: Long, n_frames: Long, content_hash: Long)

  /** Deterministic fake "decode": dimensions/frames derived from the 63-bit
    * md5 content hash of the payload. Replace with a real codec where
    * available. */
  private[graft] def decodeStub(m: MediaIn): MediaFeatures = {
    val h = graft.plans.Md5Lower64.lower64(m.payload) & Long.MaxValue
    val w = 64 + h % 960
    val ht = 64 + (h >>> 17) % 960
    val frames = m.kind match {
      case "video" => 1 + (h >>> 31) % 240
      case "audio" => 1 + (h >>> 31) % 48000
      case _       => 1L
    }
    MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong, w, ht, frames, h)
  }

  /** documents → (doc_id, kind, payload) media frame: text bytes stand in
    * for media blobs, kind is a pure function of doc_id. */
  private def mediaOf(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaIn]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Full multimodal pipeline: synthesize binary payloads from documents,
    // decode per partition batch, project typed features.
    "q70_media_features" -> ((s, d) => {
      mediaOf(s, d)
        .mapPartitions(_.map(decodeStub))(org.apache.spark.sql.Encoders.product[MediaFeatures])
        .toDF()
        .orderBy("doc_id")
    }),

    // Downstream relational aggregation over extracted features — shows the
    // decode output is a first-class DataFrame for the usual operator set.
    "q71_media_stats" -> ((s, d) => {
      mediaOf(s, d)
        .mapPartitions(_.map(decodeStub))(org.apache.spark.sql.Encoders.product[MediaFeatures])
        .toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          round(avg("width"), 4).as("avg_width"),
          max("n_frames").as("max_frames"))
        .orderBy("kind")
    }),

    // Frame sampling: for video, take every ⌈n_frames/8⌉-th frame — the
    // row-generating media op (one output row per sampled frame). The
    // per-frame "extracted" hash is stub-derived from the content hash via
    // overflow-free modular arithmetic, so the oracle replays it; real
    // decoders swap in at the frame_hash projection.
    "q72_media_frame_sample" -> ((s, d) => {
      val features = mediaOf(s, d)
        .mapPartitions(_.map(decodeStub))(org.apache.spark.sql.Encoders.product[MediaFeatures])
        .toDF()
      features
        .filter(col("kind") === "video")
        .withColumn("stride", greatest(lit(1L), floor(col("n_frames") / 8).cast("bigint")))
        .select(
          col("doc_id"), col("n_frames"), col("stride"),
          explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))).as("frame_idx"),
          col("content_hash"))
        .withColumn("frame_hash",
          (col("content_hash") % 1000000007L * 31 + col("frame_idx")) % 1000000007L)
        .select("doc_id", "n_frames", "stride", "frame_idx", "frame_hash")
        .orderBy("doc_id", "frame_idx")
    }),

    // Resize-to-fit 224×224 (aspect preserved): the geometry is exact
    // integer math (floor division by the max dimension) on both engines;
    // the resized-payload hash is stub-derived like q72.
    "q73_media_resize" -> ((s, d) => {
      val features = mediaOf(s, d)
        .mapPartitions(_.map(decodeStub))(org.apache.spark.sql.Encoders.product[MediaFeatures])
        .toDF()
      val m = greatest(col("width"), col("height"))
      features
        .filter(col("kind") === "image")
        .withColumn("out_w", greatest(lit(1L), floor(col("width") * 224 / m).cast("bigint")))
        .withColumn("out_h", greatest(lit(1L), floor(col("height") * 224 / m).cast("bigint")))
        .withColumn("resized_hash",
          (col("content_hash") % 1000000007L * 37 + col("out_w") * 224 + col("out_h")) % 1000000007L)
        .select("doc_id", "width", "height", "out_w", "out_h", "resized_hash")
        .orderBy("doc_id")
    }))

  /** The decode stub replayed in SQL: same md5-derived 63-bit hash, same
    * modular feature derivation (all values non-negative, so % and >> agree
    * across engines). */
  private val featuresSql: String =
    """SELECT doc_id,
      | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      | CAST(strlen(text) AS BIGINT) AS n_bytes,
      | 64 + h % 960 AS width,
      | 64 + (h >> 17) % 960 AS height,
      | CASE doc_id % 3 WHEN 2 THEN 1 + (h >> 31) % 240
      |                 WHEN 1 THEN 1 + (h >> 31) % 48000 ELSE 1 END AS n_frames,
      | h AS content_hash
      |FROM (SELECT doc_id, text,
      |  CAST(md5_number_lower(text) & 9223372036854775807::UBIGINT AS BIGINT) AS h
      | FROM documents) t""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q70_media_features" ->
      s"""SELECT doc_id, kind, n_bytes, width, height, n_frames, content_hash
         |FROM ($featuresSql) f ORDER BY doc_id""".stripMargin,

    "q71_media_stats" ->
      s"""SELECT kind, count(*) AS n, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
         | round(avg(width), 4) AS avg_width, max(n_frames) AS max_frames
         |FROM ($featuresSql) f GROUP BY kind ORDER BY kind""".stripMargin,

    "q72_media_frame_sample" ->
      s"""WITH f AS (SELECT * FROM ($featuresSql) t WHERE kind = 'video'),
         | st AS (SELECT doc_id, n_frames, content_hash,
         |        greatest(1, n_frames // 8) AS stride FROM f),
         | u AS (SELECT doc_id, n_frames, stride, content_hash,
         |       unnest(range(0, n_frames, stride)) AS frame_idx FROM st)
         |SELECT doc_id, n_frames, stride, frame_idx,
         | (content_hash % 1000000007 * 31 + frame_idx) % 1000000007 AS frame_hash
         |FROM u ORDER BY doc_id, frame_idx""".stripMargin,

    "q73_media_resize" ->
      s"""WITH f AS (SELECT * FROM ($featuresSql) t WHERE kind = 'image')
         |SELECT doc_id, width, height,
         | greatest(1, (width * 224) // greatest(width, height)) AS out_w,
         | greatest(1, (height * 224) // greatest(width, height)) AS out_h,
         | (content_hash % 1000000007 * 37 +
         |  greatest(1, (width * 224) // greatest(width, height)) * 224 +
         |  greatest(1, (height * 224) // greatest(width, height))) % 1000000007 AS resized_hash
         |FROM f ORDER BY doc_id""".stripMargin)
}

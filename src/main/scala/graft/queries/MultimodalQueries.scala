package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline as declared queries: deterministic image
  * synthesis from the corpus (even doc_ids encode as binary PPM, odd as
  * 24-bit BMP) → REAL container decode in a partition-local
  * mapPartitions → pixel-level features. The oracle reproduces the
  * pixel ALGEBRA directly from the text bytes (ASCII corpus ⇒ byte ==
  * char), so a decoder that misparses a header, forgets the BMP
  * bottom-up row order / BGR swap / row padding, or drops the PPM
  * comment rule hash-mismatches immediately. */
object MultimodalQueries extends QueryGroup {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Image features from real decoded pixels: header dims, per-channel
    // sums, dark-pixel count (integer luma < 128). Both containers must
    // yield the identical algebra (kind only tags which parser ran).
    "q41_multimodal_features" -> ((s, d) => {
      val media = Multimodal.attachImage(s, Tables.documents(s, d))
      Multimodal.imageFeatures(s, media)
        .select(col("doc_id"), col("kind"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("n_dark"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling over DECODED pixel rows: one frame per image row
    // (1:N flatMap), keep every 4th frame, per-doc aggregate. The frame
    // sums stay exact in BIGINT (each row sum < 1e9+7).
    "q60_multimodal_frames" -> ((s, d) => {
      val media = Multimodal.attachImage(s, Tables.documents(s, d))
      Multimodal.frameFeatures(s, media)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          count(when(col("frame_idx") % 4 === 0, 1)).as("n_sampled"),
          (sum(when(col("frame_idx") % 4 === 0, col("fsum")).otherwise(0L)) % 1000000007L)
            .cast("long").as("samp_sum"))
        .orderBy(col("doc_id"))
    })
  )

  /** Shared CTE chain: the synthesized image's byte array from the text
    * (width 8, height ⌈⌈len/3⌉/8⌉, byte j = text byte j mod len). */
  private val imageCtes: String =
    """d AS (SELECT doc_id, text, strlen(text) AS len
      |      FROM documents WHERE strlen(text) > 0),
      |dims AS (SELECT doc_id, text, len, ((len + 2) // 3 + 7) // 8 AS h FROM d),
      |bs AS (SELECT doc_id, h, list_transform(range(0, 24 * h),
      |         j -> CAST(ascii(text[(j % len) + 1]) AS BIGINT)) AS b
      |       FROM dims)""".stripMargin

  override def oracle: Map[String, String] = Map(
    "q41_multimodal_features" ->
      s"""WITH $imageCtes,
         |ch AS (SELECT doc_id, h,
         |         list_transform(range(0, 8 * h), i -> b[3 * i + 1]) AS rs,
         |         list_transform(range(0, 8 * h), i -> b[3 * i + 2]) AS gs,
         |         list_transform(range(0, 8 * h), i -> b[3 * i + 3]) AS bls
         |       FROM bs)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS kind,
         |  CAST(8 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(list_reduce(rs, (a, b) -> a + b) AS BIGINT) AS sum_r,
         |  CAST(list_reduce(gs, (a, b) -> a + b) AS BIGINT) AS sum_g,
         |  CAST(list_reduce(bls, (a, b) -> a + b) AS BIGINT) AS sum_b,
         |  CAST(len(list_filter(range(0, 8 * h),
         |    i -> (299 * rs[i + 1] + 587 * gs[i + 1] + 114 * bls[i + 1]) // 1000 < 128))
         |    AS BIGINT) AS n_dark
         |FROM ch ORDER BY doc_id""".stripMargin,

    "q60_multimodal_frames" ->
      s"""WITH $imageCtes,
         |f AS (SELECT doc_id, u.k AS k,
         |        list_reduce(list_transform(range(24 * u.k, 24 * (u.k + 1)),
         |                                   j -> b[j + 1]),
         |                    (a, c) -> (a + c) % 1000000007) AS fsum
         |      FROM bs, unnest(range(0, h)) u(k))
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_frames,
         |       CAST(COUNT(CASE WHEN k % 4 = 0 THEN 1 END) AS BIGINT) AS n_sampled,
         |       CAST(SUM(CASE WHEN k % 4 = 0 THEN fsum ELSE 0 END) % 1000000007 AS BIGINT) AS samp_sum
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}

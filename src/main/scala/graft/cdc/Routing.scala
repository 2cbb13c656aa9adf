package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Route model + compiler (reference: route match at
  * /root/reference/internal/binwatch/blsenderwork/blsenderwork.go:182-184,
  * config at api/v1alpha2/config.go:161-167).
  *
  * Reference quirk preserved behind a flag: the match is
  * `operation ∈ ops AND concat(db,'.',table) == dbTable` with NO wildcard,
  * so an empty `dbTable` (as in the shipped example config,
  * docs/binwatch.v1alpha2.yaml:67) matches NOTHING. Default here:
  * empty/"*" = match-all; `strictCompat = true` restores the reference
  * behavior (SURVEY.md §2.A).
  */
final case class Route(
    name: String,
    connector: String,
    operations: Seq[String],
    dbTable: String,
    template: String)

object Routing {

  /** Compile a route to a Catalyst predicate over the envelope columns.
    * Plain `filter` — pushed down / codegen'd like any other predicate. */
  def predicate(route: Route, strictCompat: Boolean = false): Column = {
    val opMatch = col("data.operation").isin(route.operations: _*)
    val dbtMatch =
      if (route.dbTable.isEmpty || route.dbTable == "*") {
        if (strictCompat) lit(false) // blsenderwork.go:183-184: "" matches nothing
        else lit(true)
      } else
        concat_ws(".", col("data.database"), col("data.table")) === route.dbTable
    opMatch && dbtMatch
  }

  /** Envelope rows matching a route, with the rendered outbound payload
    * (A10 filter + A11 template projection in one select). */
  def outbound(envelope: DataFrame, route: Route, strictCompat: Boolean = false): DataFrame =
    envelope.filter(predicate(route, strictCompat))
      .withColumn("payload", Template.render(route.template,
        struct(col("itemID"), col("log"), col("data"))))

  /** All routes at once: one pass over the envelope, `route` column tags
    * the match (an event matching N routes is emitted N times, matching
    * the reference's per-route loop, blsenderwork.go:180-199). */
  def outboundAll(envelope: DataFrame, routes: Seq[Route],
      strictCompat: Boolean = false): DataFrame =
    routes.map { r =>
      outbound(envelope, r, strictCompat).withColumn("route", lit(r.name))
        .withColumn("connector", lit(r.connector))
    }.reduce(_ unionByName _)
}

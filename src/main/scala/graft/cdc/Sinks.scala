package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Connector sinks (A13–A15) — reference interface Send([]byte) error
  * (/root/reference/internal/connectors/connectors.go:13-15).
  *
  * Delivery contract: at-least-once (the reference checkpoints AFTER the
  * send, blsenderwork.go:204-213, so crash-replay duplicates are possible
  * there too); every delivery carries an idempotency key derived from
  * (binlogFile, binlogPosition, rowIdx) so idempotent receivers observe
  * exactly-once (SURVEY.md §7 hard-part 5).
  */
trait Connector extends Serializable {
  def name: String
  /** Send one payload; throw on failure (caller handles retry/stop).
    * May buffer/pipeline internally — delivery is only guaranteed after
    * flush() returns. */
  def send(payload: Array[Byte], idempotencyKey: String): Unit
  /** Block until every send() accepted so far is durably delivered;
    * throw if any failed. Called once per partition before the batch
    * commits, so at-least-once is preserved. */
  def flush(): Unit = ()
  def close(): Unit = ()
  /** True when this connector joins multiple events into one delivery
    * (range idempotency keys). Dispatch pins the partition layout and
    * sorts only when some connector batches — per-event keys are
    * order-immune and skip both. */
  def batching: Boolean = false
  /** True when this connector delivers strictly in the order send() is
    * called (no pipelining window), so sorted iteration gives the
    * receiver in-log-order application — the reference's
    * senderWorkers=1 total-order mode. Dispatch sorts partitions into
    * log order for such connectors; pipelined connectors complete out
    * of order anyway, so sorting buys them nothing. */
  def ordered: Boolean = false
}

/** HTTP webhook connector — parity with connectors.webhook.go:24-76:
  * configured method/url/headers, optional basic auth, non-2xx = error.
  *
  * Sends are pipelined through a bounded async in-flight window
  * (`maxInFlight`) so sink latency is hidden: at 20 ms webhook RTT a
  * sequential sender caps at 50 events/s/partition, while a 64-deep
  * window sustains ~3,000. Ordering: deliveries within a partition may
  * complete out of order unless maxInFlight=1 — the same trade the
  * reference makes with `senderWorkers > 1` (README.md:38: total order
  * only with a single worker). Failures surface on the next send() or
  * on flush(), failing the task before the batch commits, so the
  * at-least-once contract is unchanged. */
final class WebhookConnector(
    val name: String,
    url: String,
    method: String = "POST",
    headers: Map[String, String] = Map.empty,
    basicAuth: Option[(String, String)] = None,
    timeout: Duration = Duration.ofSeconds(10),
    maxInFlight: Int = 64,
    // connectors.webhook.go:38-39 (tls.Config.InsecureSkipVerify):
    // accept untrusted/self-signed server certificates. Slightly
    // STRICTER than Go's flag: hostname verification against the
    // presented cert stays on (disabling it in java.net.http needs a
    // JVM-global property — a side effect a library shouldn't make).
    tlsSkipVerify: Boolean = false,
    // OPT-IN delivery batching (engine extension; default 1 = the
    // reference's per-event POST). When > 1, up to `batchSize` rendered
    // payloads are joined — in send order — into ONE request whose body
    // is a JSON array of the payloads and whose idempotency key is
    // "<firstKey>..<lastKey>" (the batch's event range; receivers dedup
    // whole batches, and at-least-once replay re-sends whole batches).
    // Batch identity is layout-pinned by the dispatcher: events are
    // hash-placed by key into `deliveryPartitions` buckets and sorted
    // into log order, so replays and restarts re-form byte-identical
    // batches regardless of session shuffle/AQE config (r7 advisory).
    // Requires templates that render standalone JSON values. Lifts the
    // per-event-POST ceiling (the measured ~16k ev/s warm loopback
    // stage) by ~the batch factor: request count, header parsing, and
    // response round-trips all divide by `batchSize`.
    batchSize: Int = 1) extends Connector {

  override def batching: Boolean = batchSize > 1
  // maxInFlight=1 is the reference's senderWorkers=1 total-order mode
  // (README.md:38): sends block one at a time, so sorted input IS
  // delivery order. A wider window completes out of order by design.
  override def ordered: Boolean = maxInFlight <= 1

  // One HttpClient per executor JVM (not per deserialized task closure):
  // keeps the keep-alive connection pool warm across partitions and
  // micro-batches instead of re-handshaking per task.
  @transient private lazy val client: HttpClient =
    if (tlsSkipVerify) WebhookConnector.sharedInsecure else WebhookConnector.shared
  // Per-task-instance window (task closures are deserialized per task,
  // and a task is single-threaded, so no synchronization needed). The
  // request rides along with its future so a connection-level failure
  // (keep-alive raced with server-side idle close — routine with real
  // webhook endpoints) can be retried; retry is legal under the
  // at-least-once contract and idempotent receivers dedup by key.
  @transient private lazy val inFlight =
    new java.util.ArrayDeque[(HttpRequest, java.util.concurrent.CompletableFuture[HttpResponse[String]])]()
  // Batch accumulator (per task instance, like the window): payloads
  // waiting for the batch to fill or for flush().
  @transient private lazy val pending =
    new java.util.ArrayList[(Array[Byte], String)]()

  override def send(payload: Array[Byte], idempotencyKey: String): Unit =
    if (batchSize <= 1) enqueue(payload, idempotencyKey)
    else {
      pending.add(payload -> idempotencyKey)
      if (pending.size >= batchSize) drainPending()
    }

  /** Join the accumulated payloads into one JSON-array request. */
  private def drainPending(): Unit = if (!pending.isEmpty) {
    val n = pending.size
    var total = n + 1 // brackets + commas
    var i = 0
    while (i < n) { total += pending.get(i)._1.length; i += 1 }
    val body = new java.io.ByteArrayOutputStream(total)
    body.write('[')
    i = 0
    while (i < n) {
      if (i > 0) body.write(',')
      val p = pending.get(i)._1
      body.write(p, 0, p.length)
      i += 1
    }
    body.write(']')
    val key = s"${pending.get(0)._2}..${pending.get(n - 1)._2}"
    pending.clear()
    enqueue(body.toByteArray, key)
  }

  private def enqueue(payload: Array[Byte], idempotencyKey: String): Unit = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(timeout)
      .method(method, HttpRequest.BodyPublishers.ofByteArray(payload))
      .header("X-Idempotency-Key", idempotencyKey)
    headers.foreach { case (k, v) => b.header(k, v) }
    basicAuth.foreach { case (u, p) =>
      b.header("Authorization", "Basic " + Base64.getEncoder
        .encodeToString(s"$u:$p".getBytes(StandardCharsets.UTF_8)))
    }
    while (inFlight.size >= maxInFlight) awaitOldest()
    // JVM-global in-flight budget, ON TOP of the per-task window: with N
    // concurrent tasks each pipelining `maxInFlight` deep, total
    // concurrency is N×window — 16 tasks × 64 = 1024 simultaneous
    // connections, which collapses both java.net.http (connection storm,
    // connect timeouts) and typical receiving endpoints. Measured on
    // loopback: ~64–128 total in-flight sustains 11–14k req/s; 1024
    // degrades to ~3k with connect-timeout failures. The permit is
    // released when the response (or failure) completes, so the budget
    // tracks true wire concurrency, not window occupancy.
    WebhookConnector.jvmPermits.acquire()
    val req = b.build()
    val fut =
      try client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
      catch { case e: Throwable => WebhookConnector.jvmPermits.release(); throw e }
    fut.whenComplete((_, _) => WebhookConnector.jvmPermits.release())
    inFlight.add(req -> fut)
  }

  private def awaitOldest(): Unit = {
    val (req, fut) = inFlight.poll()
    val resp =
      try fut.join()
      catch {
        case e: java.util.concurrent.CompletionException
            if e.getCause.isInstanceOf[java.io.IOException] =>
          client.send(req, HttpResponse.BodyHandlers.ofString()) // one sync retry
      }
    // connectors.webhook.go:71-73: any non-2xx status is an error.
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"webhook '$name' returned status ${resp.statusCode()}")
  }

  override def flush(): Unit = {
    if (batchSize > 1) drainPending() // partial tail batch rides out now
    while (!inFlight.isEmpty) awaitOldest()
  }
}

object WebhookConnector {
  /** JVM-wide webhook concurrency budget (total in-flight HTTP requests
    * across every task and connector in this executor). Override with
    * -Dgraft.webhook.maxInFlightJvm=N. Default 128: enough to hide
    * 20 ms sink RTT at ~6,400 events/s per executor, low enough that
    * the connection count never storms the endpoint. */
  private[cdc] val jvmPermits = new java.util.concurrent.Semaphore(
    Integer.getInteger("graft.webhook.maxInFlightJvm", 128))

  lazy val shared: HttpClient = HttpClient.newBuilder()
    .version(HttpClient.Version.HTTP_1_1)
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  /** Trust-all twin of [[shared]] for `tlsSkipVerify` connectors. */
  lazy val sharedInsecure: HttpClient = {
    val trustAll = new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(
          c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
        Array.empty
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll), new java.security.SecureRandom())
    HttpClient.newBuilder()
      .version(HttpClient.Version.HTTP_1_1)
      .connectTimeout(Duration.ofSeconds(10))
      .sslContext(ctx)
      .build()
  }
}

/** GCP Pub/Sub connector (A14) — semantics parity with
  * connectors.pubsub.go:19-42: Send ≙ Publish + blocking result.Get —
  * one message per call, delivery confirmed by the returned messageId,
  * any publish failure surfaced as the Send error. Transport is the
  * public Pub/Sub REST API (`POST {endpoint}/v1/projects/{p}/topics/{t}
  * :publish`, base64 data, `{"messageIds":[...]}` ack) rather than a
  * vendored client library; `endpoint` override points at an emulator
  * or test stub. The idempotency key rides as a message attribute so
  * idempotent subscribers observe exactly-once (same contract as the
  * webhook's X-Idempotency-Key header). */
final class PubSubConnector(
    val name: String,
    projectId: String,
    topicId: String,
    endpoint: String = "https://pubsub.googleapis.com",
    authToken: Option[String] = None,
    timeout: Duration = Duration.ofSeconds(10),
    // Service-account flow (GcpTokenMinter): minted + auto-refreshed
    // Bearer tokens. A static `authToken` (emulator / external
    // refresher) wins when both are set.
    tokenMinter: Option[GcpTokenMinter] = None) extends Connector {

  @transient private lazy val client: HttpClient = WebhookConnector.shared

  // send() blocks on the publish ack (result.Get parity), so sorted
  // input is delivery order — always total-order
  override def ordered: Boolean = true

  /** Reference topic path form (pubsub.Client.Topic(topicID) under
    * project — "projects/{project}/topics/{topic}"). */
  val topicPath: String = s"projects/$projectId/topics/$topicId"

  override def send(payload: Array[Byte], idempotencyKey: String): Unit = {
    val body =
      s"""{"messages":[{"data":"${Base64.getEncoder.encodeToString(payload)}",""" +
        s""""attributes":{"idempotencyKey":${TemplateEngine.toJson(idempotencyKey)}}}]}"""
    val b = HttpRequest.newBuilder(URI.create(s"$endpoint/v1/$topicPath:publish"))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
    authToken.orElse(tokenMinter.map(_.token()))
      .foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    // result.Get parity: publish is only successful once the service
    // acks with an assigned message id (connectors.pubsub.go:36-41).
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"error publishing message in google pubsub '$name' ($topicPath): " +
          s"status ${resp.statusCode()}")
    if (!resp.body().contains("messageIds"))
      throw new RuntimeException(
        s"error publishing message in google pubsub '$name' ($topicPath): no messageIds ack")
  }
}

/** In-JVM collecting connector for tests (the reference's pubsub
  * connector, connectors.pubsub.go:19-42, is Send ≙ blocking publish;
  * the seam here is identical). */
final class CollectingConnector(val name: String) extends Connector {
  override def ordered: Boolean = true // synchronous record, like pubsub
  override def send(payload: Array[Byte], idempotencyKey: String): Unit =
    CollectingConnector.record(name, idempotencyKey, new String(payload, StandardCharsets.UTF_8))
}

object CollectingConnector {
  // Keyed static store: survives closure serialization in local mode.
  private val store = new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[(String, String)]]()
  def record(name: String, key: String, payload: String): Unit =
    store.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[(String, String)]())
      .add(key -> payload)
  def drain(name: String): Seq[(String, String)] = {
    val q = store.getOrDefault(name, new ConcurrentLinkedQueue[(String, String)]())
    q.iterator().asScala.toSeq
  }
  def clear(): Unit = store.clear()
}

/** Connector factory (A15 parity — connectors.go:17-33). */
object Connectors {
  def dispatch(routes: Seq[Route], connectors: Map[String, Connector],
      strictCompat: Boolean = false, deliveryPartitions: Int = 32)(envelope: DataFrame): Unit = {
    val outbound =
      outboundFrame(routes, connectors, strictCompat, deliveryPartitions)(envelope)
    // Executor-side delivery: no collect; one connector instance per
    // partition, rows streamed through it; flush before the partition
    // (and hence the batch) completes so pipelined sends are durable.
    outbound.foreachPartition { (it: Iterator[Row]) =>
      val used = scala.collection.mutable.Set.empty[String]
      it.foreach { r =>
        val name = r.getAs[String]("connector")
        used += name
        connectors(name).send(
          r.getAs[String]("payload").getBytes(StandardCharsets.UTF_8),
          r.getAs[String]("idemKey"))
      }
      used.foreach(connectors(_).flush())
    }
  }

  /** The dispatch plan up to (but not including) the foreachPartition
    * action — exposed so plan tests can pin its shape (e.g. that the
    * batch-mode exchange carries only the delivery columns, never the
    * decoded row payloads). */
  private[cdc] def outboundFrame(routes: Seq[Route], connectors: Map[String, Connector],
      strictCompat: Boolean = false, deliveryPartitions: Int = 32)(envelope: DataFrame): DataFrame = {
    val routed = Routing.outboundAll(envelope, routes, strictCompat)
    // Two independent reasons to pin order, composed per what the
    // configured connectors actually need (r7 advisory: the default
    // pipelined per-event path needs neither and pays for neither):
    //  - BATCHING connectors additionally need layout pinning:
    //    repartition on the event keys with a CONFIG-pinned count
    //    (`deliveryPartitions`, not spark.sql.shuffle.partitions), so
    //    which partition an event lands in is a pure function of its
    //    key and a checkpoint resumed under different session confs
    //    (shuffle partitions, AQE) re-forms the SAME batches — sorted
    //    replays then rebuild byte-identical batches under identical
    //    range idempotency keys. Changing deliveryPartitions itself
    //    re-batches — an explicit config-file edit, documented there.
    //  - ORDERED connectors (blocking sends: maxInFlight=1 webhooks —
    //    the reference's senderWorkers=1 total-order mode — and
    //    pubsub's acked publishes) need the log-order sort so sorted
    //    iteration IS delivery order; pipelined connectors complete
    //    out of order regardless, so they skip the sort.
    val batching = connectors.values.exists(_.batching)
    val needSort = batching || connectors.values.exists(_.ordered)
    val placed =
      if (!batching) routed
      else routed.repartition(deliveryPartitions, col("connector"),
        col("log.binlogFile"), col("log.binlogPosition"),
        coalesce(col("rowIdx"), lit(0)))
    val ordered =
      if (!needSort) placed
      else placed.sortWithinPartitions(col("connector"), col("log.binlogFile"),
        col("log.binlogPosition"), coalesce(col("rowIdx"), lit(0)))
    ordered
      .select(col("connector"), col("payload"),
        concat_ws("/", col("log.binlogFile"),
          col("log.binlogPosition").cast("string"),
          coalesce(col("rowIdx"), lit(0)).cast("string")).as("idemKey"))
  }

  /** foreachBatch adapter for Structured Streaming:
    * stream.writeStream.foreachBatch(Connectors.forEachBatch(routes, conns)). */
  def forEachBatch(routes: Seq[Route], connectors: Map[String, Connector],
      strictCompat: Boolean = false,
      deliveryPartitions: Int = 32): (DataFrame, Long) => Unit =
    (batch, _) => dispatch(routes, connectors, strictCompat, deliveryPartitions)(batch)
}

package graft.source.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side page fetch for the DSv2 source: implementations must be
  * zero-arg-constructible (instantiated by class name on each executor).
  * Production: an HTTP client; tests/offline: fixture maps.
  */
trait PageFetcher extends Serializable {
  def fetch(url: String): String
}

/** `java.net.http` fetcher — the production default. */
class HttpPageFetcher extends PageFetcher {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  override def fetch(url: String): String = {
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    // A non-2xx page MUST be an error, not data: a 503/429 body parses as
    // a bundle with no entries, and an "empty" page would flow into the
    // full-outer diff as mass DELETEs — a transient hiccup becoming data
    // loss. Raising IOException routes it into fetchWithRetry's transient
    // scope (status-coded failures ARE the dominant transient mode).
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} fetching $url: ${resp.body().take(200)}")
    resp.body()
  }
}

/** DataSource V2 FHIR-search source (`format("blaze")`): one
  * `InputPartition` PER PAGE, fetched and parsed on executors.
  *
  * The reference walks an opaque next-link chain sequentially
  * (`src/main.rs:261-269`) — inherently one-at-a-time, which
  * [[graft.source.BlazeSource]] reproduces for parity. This source is the
  * scale path: FHIR search supports offset paging
  * (`_count` + `_getpagesoffset`), so after one `_count=0` probe for the
  * total (`src/main.rs:290-292` — the same zero-row trick the reference
  * uses for reconciliation), page URLs are enumerable up front and the
  * fetch parallelizes across the cluster; ingest throughput scales with
  * executors instead of one driver connection.
  *
  * Options: `baseUrl`, `resourceType`, `pageSize` (default 5000 =
  * reference `src/main.rs:360`), `fetcher` (class name, default
  * [[HttpPageFetcher]]). Schema: `resource: STRING` — raw resource JSON,
  * one row per Bundle entry, exactly the relation parity q01 declares.
  */
class BlazeTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "blaze"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BlazeTableProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    // reader options keep caller case here; normalize for lookups
    new BlazeTable(properties.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap)
}

object BlazeTableProvider {
  val schema: StructType = StructType(Seq(StructField("resource", StringType)))

  def makeFetcher(className: String): PageFetcher =
    Class.forName(className).getDeclaredConstructor().newInstance()
      .asInstanceOf[PageFetcher]

  /** Bounded in-fetch retry with doubling backoff — reference
    * `db_utils.rs:35-59` semantics (retry the connection, don't fail the
    * sync on a transient hiccup) scoped to one page: without it a single
    * failed page fetch escalates to a full Spark TASK retry, which
    * re-pays scheduling and re-fetches from scratch; with it the retry
    * stays inside the partition reader. Attempts are bounded so a dead
    * server still fails loudly (then Spark's task-level retry — and
    * ultimately the job — surfaces it).
    */
  def fetchWithRetry(fetcher: PageFetcher, url: String, attempts: Int,
                     backoffMs: Long, sleep: Long => Unit = Thread.sleep): String = {
    var attempt = 1
    var delay = backoffMs
    while (true) {
      // Retry ONLY transient IO failures (timeouts, resets — all
      // IOException subtypes), mirroring the reference's connection-retry
      // scope: a deterministic error (auth, malformed URL, parse bug)
      // would fail identically `attempts` times per partition, so it is
      // rethrown immediately and keeps its original class for the caller.
      try return fetcher.fetch(url)
      catch {
        case e: java.io.IOException =>
          if (attempt >= attempts)
            throw new java.io.IOException(
              s"page fetch failed after $attempts attempts: $url", e)
          sleep(delay)
          delay *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One page's entries, parsed with Jackson (executor-side). */
  def parseEntries(body: String): Iterator[String] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val entries = mapper.readTree(body).path("entry")
    if (!entries.isArray) Iterator.empty
    else entries.elements().asScala.flatMap { e =>
      val r = e.path("resource")
      if (r.isMissingNode || r.isNull) None else Some(mapper.writeValueAsString(r))
    }
  }
}

private[v2] class BlazeTable(props: Map[String, String])
  extends Table with SupportsRead {

  override def name(): String =
    s"blaze:${props.getOrElse("resourcetype", "?")}"
  override def schema(): StructType = BlazeTableProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch
      with SupportsPushDownAggregates with SupportsPushDownLimit {
      private val baseUrl = props("baseurl")
      private val resourceType = props("resourcetype")
      private val pageSize = props.getOrElse("pagesize", "5000").toInt
      private val fetcherClass =
        props.getOrElse("fetcher", classOf[HttpPageFetcher].getName)
      private val retryAttempts = props.getOrElse("retries", "3").toInt
      private val retryBackoffMs = props.getOrElse("retrybackoffms", "200").toLong
      private var countPushed = false
      private var pushedLimit: Option[Int] = None

      private def isBareCountStar(agg: Aggregation): Boolean =
        agg.groupByExpressions.isEmpty &&
          agg.aggregateExpressions.length == 1 &&
          agg.aggregateExpressions.head.isInstanceOf[CountStar]

      /** COUNT(*) with no grouping is answered ENTIRELY by the server's
        * `_count=0` total (reference `src/main.rs:290-292`) — the O11
        * reconciliation probe as DSv2 aggregate pushdown: zero resource
        * rows cross the wire, any scale.
        */
      override def pushAggregation(agg: Aggregation): Boolean = {
        countPushed = isBareCountStar(agg)
        countPushed
      }
      override def supportCompletePushDown(agg: Aggregation): Boolean =
        isBareCountStar(agg)

      /** `limit(n)` plans only the pages that can contribute rows (the
        * limit itself is re-applied by Spark — partial pushdown).
        */
      override def pushLimit(limit: Int): Boolean = {
        pushedLimit = Some(limit)
        true
      }
      override def isPartiallyPushed: Boolean = true

      override def build(): Scan = this
      override def readSchema(): StructType =
        if (countPushed) new StructType().add("count(*)", LongType)
        else BlazeTableProvider.schema
      override def toBatch: Batch = this
      override def description(): String =
        s"blaze:$resourceType" +
          (if (countPushed) " PushedAggregates: [COUNT(*)]" else "") +
          pushedLimit.map(l => s" PushedLimit: $l").getOrElse("")

      override def planInputPartitions(): Array[InputPartition] = {
        // driver-side: one _count=0 probe, zero resource rows transferred
        val probe = BlazeTableProvider.fetchWithRetry(
          BlazeTableProvider.makeFetcher(fetcherClass),
          s"$baseUrl/fhir/$resourceType?_count=0", retryAttempts, retryBackoffMs)
        val total = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(probe).path("total").asLong(0L)
        if (countPushed) {
          // single partition, single row: the final aggregate result
          Array(BlazeCountPartition(total))
        } else {
          val wanted = pushedLimit.map(l => math.min(total, l.toLong))
            .getOrElse(total)
          val pages = math.max(0L, (wanted + pageSize - 1) / pageSize).toInt
          (0 until pages).map { i =>
            BlazePagePartition(
              s"$baseUrl/fhir/$resourceType?_count=$pageSize" +
                s"&_getpagesoffset=${i.toLong * pageSize}&_history=current")
              .asInstanceOf[InputPartition]
          }.toArray
        }
      }

      override def createReaderFactory(): PartitionReaderFactory =
        if (countPushed) new BlazeCountReaderFactory
        else new BlazeReaderFactory(fetcherClass, retryAttempts, retryBackoffMs)
    }
}

case class BlazePagePartition(url: String) extends InputPartition

/** Carries the probed total itself: the pushed COUNT(*) needs no executor
  * IO at all. */
case class BlazeCountPartition(total: Long) extends InputPartition

private[v2] class BlazeCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val total = partition.asInstanceOf[BlazeCountPartition].total
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](total))
      override def close(): Unit = ()
    }
  }
}

private[v2] class BlazeReaderFactory(fetcherClass: String,
                                     retryAttempts: Int, retryBackoffMs: Long)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val url = partition.asInstanceOf[BlazePagePartition].url
    new PartitionReader[InternalRow] {
      // fetcher + parse lazily on first next(): executor-side IO, with
      // bounded in-reader retry before Spark's task retry gets involved
      private lazy val it: Iterator[String] = BlazeTableProvider
        .parseEntries(BlazeTableProvider.fetchWithRetry(
          BlazeTableProvider.makeFetcher(fetcherClass), url,
          retryAttempts, retryBackoffMs))
      private var current: String = _
      override def next(): Boolean = {
        if (it.hasNext) { current = it.next(); true } else false
      }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(current)))
      override def close(): Unit = ()
    }
  }
}

package graft.sources

import java.util
import scala.collection.mutable
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 restatement of the reference's paginated scrape (SRC1,
  * reference `dags/dag.py:172-292`): a scan that walks page files
  * serially, following each page's `next` link until absent, parsing one
  * post per JSON line and SKIPPING malformed rows (the reference's
  * per-element try/except quarantine, `dags/dag.py:270-272` — SRC2).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedPostsSource")
  *     .option("path", dir).option("first", "page-0.json").load()
  * }}}
  *
  * Page file = JSON lines of posts; an optional final line
  * `{"next": "page-1.json"}` names the next page (relative to `path`).
  *
  * Scale notes: pagination is inherently serial (each page names the
  * next), so the scan is ONE InputPartition — exactly the reference's
  * behavior. A real 100 TB ingest would snapshot pages to storage first
  * and read them as a splittable format; this source exists for the
  * live-cursor boundary, and implements SupportsPushDownRequiredColumns
  * so Catalyst's column pruning reaches the parser (unused fields are
  * never materialized into rows).
  */
class PagedPostsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedPostsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 options are case-insensitive by contract; the raw properties
    // map preserves the user's casing, so wrap before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    def intOpt(k: String, dflt: Int): Int =
      Option(opts.get(k)).map(_.toInt).getOrElse(dflt)
    new PagedPostsTable(opts.get("path"),
      Option(opts.get("first")).getOrElse("page-0.json"),
      RetryConf(
        retries = intOpt("retries", 0),
        retryDelayMs = intOpt("retryDelayMs", 2000),
        pageDelayMs = intOpt("pageDelayMs", 0)))
  }
}

/** Source-level retry/pacing semantics (reference `dags/dag.py:199-202,
  * 279`: fetch failure → sleep 2 s and retry; 1 s pacing between pages).
  *
  * `retries = 0` (default) keeps snapshot semantics: an absent page file
  * ends the chain silently. With `retries > 0`, an absent or unreadable
  * page is a TRANSIENT fault: the reader re-attempts up to `retries`
  * times, `retryDelayMs` apart, then throws — a paginated cursor that
  * silently truncates on a hiccup would under-ingest with no signal.
  * `pageDelayMs` inserts the reference's politeness delay between page
  * loads (0 = engine-side no-op). */
case class RetryConf(retries: Int, retryDelayMs: Int, pageDelayMs: Int)

object PagedPostsSource {
  /** Raw scraped-post shape (reference `dags/dag.py:239-249`). */
  val schema: StructType = StructType(Seq(
    StructField("post_id", StringType),
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("author", StringType),
    StructField("created_utc_ms", LongType),
    StructField("upvotes", IntegerType),
    StructField("comments_text", StringType),
    StructField("subreddit", StringType)))
}

private class PagedPostsTable(path: String, first: String, retry: RetryConf)
    extends Table with SupportsRead {
  override def name(): String = s"paged_posts($path)"
  override def schema(): StructType = PagedPostsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path, first, retry)
}

private class PagedScanBuilder(path: String, first: String, retry: RetryConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedPostsSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(PagedInputPartition(path, first, retry)) // serial page chain → 1 split
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(required)
  }
}

private case class PagedInputPartition(path: String, first: String,
                                       retry: RetryConf) extends InputPartition

private class PagedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagedInputPartition]
    new PagedPostsReader(pp.path, pp.first, required, pp.retry)
  }
}

/** Serial reader: drains page i, then follows its `next` link. */
private class PagedPostsReader(dir: String, first: String, required: StructType,
                               retry: RetryConf = RetryConf(0, 2000, 0))
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var nextPage: Option[String] = Some(first)
  private val visited = mutable.Set.empty[String] // cyclic next-links must terminate
  private val buffer = mutable.Queue.empty[InternalRow]
  private var pagesLoaded = 0
  private val fieldNames = required.fields.map(_.name)

  private def parseLine(line: String): Option[AnyRef] =
    try Option(mapper.readTree(line)) catch { case _: Exception => None }

  /** Parse ONE field; throws on a missing/mistyped mandatory field. */
  private def parseField(n: JsonNode, f: String): AnyRef = f match {
    case "post_id" | "title" | "url" | "author" | "comments_text" | "subreddit" =>
      val v = n.get(f)
      if (v == null || v.isNull) {
        if (f == "post_id" || f == "title") throw new IllegalArgumentException(f)
        null
      } else UTF8String.fromString(v.asText())
    case "created_utc_ms" =>
      val v = n.get("created_utc_ms")
      if (v == null || !v.canConvertToLong) throw new IllegalArgumentException("ts")
      java.lang.Long.valueOf(v.asLong())
    case "upvotes" =>
      val v = n.get("upvotes")
      if (v == null || !v.canConvertToInt) Integer.valueOf(0)
      else Integer.valueOf(v.asInt())
    case other => throw new IllegalArgumentException(other)
  }

  private val allFieldNames = PagedPostsSource.schema.fields.map(_.name)
  private val requiredIdx = fieldNames.map(f => allFieldNames.indexOf(f))

  private def toRow(n: JsonNode): Option[InternalRow] = {
    // Per-row quarantine, like the reference's try/except per element.
    // Validity is a property of the WHOLE record — every field is parsed
    // (once) even when the projection pruned it (otherwise `count()`,
    // whose required schema is empty, would count rows a full read
    // drops); the pruned row then projects the parsed values.
    try {
      val parsed = allFieldNames.map(parseField(n, _))
      Some(InternalRow.fromSeq(requiredIdx.map(parsed).toIndexedSeq))
    } catch { case _: Exception => None }
  }

  /** One read attempt. Rows are STAGED locally and enqueued only after
    * the whole page parsed — a mid-page IO failure that gets retried
    * must not double-enqueue the rows before the failure point. */
  private def readPageOnce(file: java.io.File): Unit = {
    val staged = mutable.ArrayBuffer.empty[InternalRow]
    var next: Option[String] = None
    val src = scala.io.Source.fromFile(file, "UTF-8")
    try src.getLines().foreach { line =>
      if (line.trim.nonEmpty) parseLine(line).foreach { node =>
        val json = node.asInstanceOf[JsonNode]
        val nxt = json.get("next")
        if (nxt != null && !nxt.isNull) next = Some(nxt.asText())
        else toRow(json).foreach(staged += _)
      }
    } finally src.close()
    nextPage = next
    staged.foreach(buffer.enqueue(_))
  }

  private def loadPage(name: String): Unit = {
    nextPage = None
    if (!visited.add(name)) return // already scanned: a link cycle, stop
    if (retry.pageDelayMs > 0 && pagesLoaded > 0)
      Thread.sleep(retry.pageDelayMs) // politeness pacing between pages
    pagesLoaded += 1
    var attempt = 0
    var done = false
    while (!done) {
      val file = new java.io.File(dir, name)
      if (file.exists()) {
        try { readPageOnce(file); done = true }
        catch { case e: java.io.IOException =>
          if (attempt >= retry.retries) throw new java.io.IOException(
            s"page $name unreadable after ${attempt + 1} attempts", e)
          attempt += 1
          Thread.sleep(retry.retryDelayMs)
        }
      } else if (retry.retries == 0) {
        done = true // snapshot semantics: absent page ends the chain
      } else if (attempt >= retry.retries) {
        throw new java.io.IOException(
          s"page $name still absent after ${attempt + 1} attempts " +
            s"(${retry.retries} retries, ${retry.retryDelayMs} ms apart)")
      } else {
        attempt += 1
        Thread.sleep(retry.retryDelayMs)
      }
    }
  }

  override def next(): Boolean = {
    while (buffer.isEmpty && nextPage.isDefined) loadPage(nextPage.get)
    buffer.nonEmpty
  }

  override def get(): InternalRow = buffer.dequeue()
  override def close(): Unit = ()
}

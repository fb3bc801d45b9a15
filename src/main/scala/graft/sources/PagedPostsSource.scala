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
                        properties: util.Map[String, String]): Table =
    new PagedPostsTable(properties.get("path"),
      Option(properties.get("first")).getOrElse("page-0.json"))
}

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

private class PagedPostsTable(path: String, first: String) extends Table with SupportsRead {
  override def name(): String = s"paged_posts($path)"
  override def schema(): StructType = PagedPostsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(path, first)
}

private class PagedScanBuilder(path: String, first: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedPostsSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(PagedInputPartition(path, first)) // serial page chain → 1 split
    override def createReaderFactory(): PartitionReaderFactory =
      new PagedReaderFactory(required)
  }
}

private case class PagedInputPartition(path: String, first: String) extends InputPartition

private class PagedReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val pp = p.asInstanceOf[PagedInputPartition]
    new PagedPostsReader(pp.path, pp.first, required)
  }
}

/** Serial reader: drains page i, then follows its `next` link. */
private class PagedPostsReader(dir: String, first: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private var nextPage: Option[String] = Some(first)
  private val visited = mutable.Set.empty[String] // cyclic next-links must terminate
  private val buffer = mutable.Queue.empty[InternalRow]
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

  private def loadPage(name: String): Unit = {
    val file = new java.io.File(dir, name)
    nextPage = None
    if (!visited.add(name)) return // already scanned: a link cycle, stop
    if (file.exists()) {
      val src = scala.io.Source.fromFile(file, "UTF-8")
      try src.getLines().foreach { line =>
        if (line.trim.nonEmpty) parseLine(line).foreach { node =>
          val json = node.asInstanceOf[JsonNode]
          val nxt = json.get("next")
          if (nxt != null && !nxt.isNull) nextPage = Some(nxt.asText())
          else toRow(json).foreach(buffer.enqueue(_))
        }
      } finally src.close()
    }
  }

  override def next(): Boolean = {
    while (buffer.isEmpty && nextPage.isDefined) loadPage(nextPage.get)
    buffer.nonEmpty
  }

  override def get(): InternalRow = buffer.dequeue()
  override def close(): Unit = ()
}

package graft.source

import java.util
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 batch connector for the reference's paged HTTP catalog sources
  * (SURVEY.md §2.1 S1-S6).
  *
  * The reference fetches station catalogs page by page
  * (`page <= last_page` loops, reference app/main.py:444-487, 571-625)
  * and pushes its predicates into the request query string (`WHERE
  * source=%s`, date ranges — reference app/main.py:66-68, 722-728).
  * This connector expresses the same design in Spark's DataSourceV2
  * interface:
  *
  *  - PAGINATION ↔ PARTITION PLANNING: one `InputPartition` per page, so
  *    a 10,000-page source scans with 10,000-way parallelism and page
  *    fetches never serialize through the driver;
  *  - QUERY-PARAM PUSHDOWN ↔ `SupportsPushDownFilters`: equality
  *    predicates are accepted by the source and applied while reading
  *    the page (an HTTP implementation would turn them into request
  *    parameters); everything else stays in the Spark plan;
  *  - COLUMN PRUNING ↔ `SupportsPushDownRequiredColumns`.
  *
  * Pages live as local JSONL files (`page-*.jsonl`) — the zero-egress
  * stand-in for HTTP responses; the paging/backoff/budget logic of a
  * live connector (reference L2/T7) belongs in the PartitionReader's
  * fetch, outside the planner, exactly as SURVEY §2.1 prescribes.
  *
  * Usage: spark.read.format("graft.source.PagedJsonSource")
  *   .schema(schema).option("path", pagesDir).load()
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.defaultSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table =
    new PagedJsonTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object PagedJsonSource {
  /** Station-catalog shape (SURVEY §1.1 stations). */
  val defaultSchema: StructType = StructType(
    Seq(
      StructField("station_id", StringType),
      StructField("source", StringType),
      StructField("city", StringType),
      StructField("lat", DoubleType),
      StructField("lon", DoubleType)
    )
  )
}

class PagedJsonTable(tableSchema: StructType, path: String) extends Table with SupportsRead {
  override def name(): String = s"paged_json($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedJsonScanBuilder(tableSchema, path)
}

class PagedJsonScanBuilder(tableSchema: StructType, path: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  /** Accept STRING equality and not-null predicates (the shapes the
    * reference pushes as query params / WHERE clauses); everything else
    * is returned for Spark to evaluate. Numeric equality is deliberately
    * NOT accepted: the reader compares JSON text, and "52.50" vs 52.5
    * would silently drop matching rows — Spark trusts accepted filters
    * and never re-checks them.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(_, v) => v.isInstanceOf[String]
      case _: IsNotNull => true
      case _ => false
    }
    pushed = accepted
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new PagedJsonScan(required, path, pushed)
}

class PagedJsonScan(readSchema: StructType, path: String, pushed: Array[Filter])
    extends Scan
    with Batch {
  override def readSchema(): StructType = readSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan(path=$path, pushed=${pushed.mkString(",")})"

  /** One partition per page file — the pagination ↔ partition mapping. */
  override def planInputPartitions(): Array[InputPartition] = {
    val pages = Option(new java.io.File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("page-") && f.getName.endsWith(".jsonl"))
      .sortBy(_.getName)
    pages.map(f => PageInputPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PageReaderFactory(readSchema, pushed)
}

case class PageInputPartition(file: String) extends InputPartition

class PageReaderFactory(readSchema: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PageReader(partition.asInstanceOf[PageInputPartition].file, readSchema, pushed)
}

/** Reads one page. A live HTTP connector performs the GET (+ retry/
  * backoff/budget, reference app/main.py:447-481) right here, once per
  * partition, on the executor.
  */
class PageReader(file: String, readSchema: StructType, pushed: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file)
  private val it = lines.getLines().map(mapper.readTree).filter(matches)
  private var current: JsonNode = _

  private def matches(node: JsonNode): Boolean = pushed.forall {
    case EqualTo(attr, value) =>
      val v = node.get(attr)
      v != null && !v.isNull && v.asText() == value.toString
    case IsNotNull(attr) =>
      val v = node.get(attr)
      v != null && !v.isNull
    case _ => true
  }

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val values = readSchema.fields.map { f =>
      val v = current.get(f.name)
      if (v == null || v.isNull) null
      else
        f.dataType match {
          case StringType => UTF8String.fromString(v.asText())
          case DoubleType => if (v.isNumber) java.lang.Double.valueOf(v.asDouble()) else null
          case LongType => if (v.isNumber) java.lang.Long.valueOf(v.asLong()) else null
          case IntegerType => if (v.isNumber) java.lang.Integer.valueOf(v.asInt()) else null
          case _ => null
        }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = lines.close()
}

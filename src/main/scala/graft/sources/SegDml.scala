package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRowLevelOperations, Table, TableCatalog, TableChange, TruncatableTable}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL DML for the gseg connector: a directory-backed [[TableCatalog]]
  * plus GROUP-BASED row-level operations, so `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` run against gseg tables through Spark's
  * own rewrite rules (RewriteDeleteFromTable / RewriteUpdateTable /
  * RewriteMergeIntoTable → ReplaceData) — the copy-on-write
  * lakehouse contract (reference: the reference's pipelines mutate
  * derived CSV snapshots by full rewrite, e.g.
  * `Codes/etheroverhead.py`'s re-ingest cycle; here the same
  * mutate-a-table need is served as declarative SQL DML).
  *
  * Execution model (the part that must survive 100 TB):
  *  - the row-level SCAN prunes GROUPS (segment files) with the DML
  *    condition against header zone maps — a file whose stats prove
  *    no row can match is neither read NOR rewritten;
  *  - surviving groups are read COMPLETELY (no row filtering in the
  *    reader — the group-replacement contract: Spark's rewrite plan
  *    re-derives kept/updated/merged rows itself, and a reader that
  *    dropped rows would silently delete them);
  *  - the REPLACE-DATA write stages the rewritten generation as
  *    hidden temp segments through the normal task-commit protocol,
  *    and only the driver's job commit swaps it in: delete exactly
  *    the candidate files the scan planned, rename the new
  *    generation into place. Untouched files are never rewritten —
  *    DML cost scales with affected groups, not table size.
  */
class SegCatalog extends TableCatalog {
  private var catName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"gseg catalog '$name' needs spark.sql.catalog.$name.warehouse")
  }
  override def name(): String = catName

  private def dirOf(ident: Identifier): java.nio.file.Path =
    Paths.get((warehouse +: ident.namespace.toSeq :+ ident.name)
      .mkString("/"))
  private def sidecar(dir: java.nio.file.Path): java.nio.file.Path =
    dir.resolve(".schema.json")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = Paths.get((warehouse +: namespace.toSeq).mkString("/"))
    if (!Files.isDirectory(ns)) return Array.empty
    val l = Files.list(ns)
    try l.iterator().asScala
      .filter(Files.isDirectory(_))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally l.close()
  }

  /** Schema from the `.schema.json` sidecar when present (dot-file —
    * invisible to [[SegSource.listSegments]]), else inferred from the
    * first segment header. The sidecar exists so a created-but-empty
    * or deleted-to-empty table stays loadable. */
  override def loadTable(ident: Identifier): Table = {
    val dir = dirOf(ident)
    val sc = sidecar(dir)
    if (Files.exists(sc)) {
      val js = new String(Files.readAllBytes(sc), UTF_8)
      new SegDmlTable(DataType.fromJson(js).asInstanceOf[StructType],
        dir.toString)
    } else {
      if (!Files.isDirectory(dir)) throw new NoSuchTableException(ident)
      val files = SegSource.listSegments(dir.toString)
      if (files.isEmpty) throw new NoSuchTableException(ident)
      new SegDmlTable(SegSource.headerOf(files.head).schema, dir.toString)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = dirOf(ident)
    if (Files.exists(sidecar(dir)) || (Files.isDirectory(dir) &&
        SegSource.listSegments(dir.toString).nonEmpty))
      throw new TableAlreadyExistsException(ident)
    Files.createDirectories(dir)
    Files.write(sidecar(dir), schema.json.getBytes(UTF_8))
    new SegDmlTable(schema, dir.toString)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException("gseg: ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirOf(ident)
    if (!Files.isDirectory(dir)) return false
    graft.Fs.deleteRecursively(dir)
    true
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    if (!Files.isDirectory(dirOf(from))) throw new NoSuchTableException(from)
    if (Files.isDirectory(dirOf(to))) throw new TableAlreadyExistsException(to)
    Files.createDirectories(dirOf(to).getParent)
    Files.move(dirOf(from), dirOf(to))
    ()
  }
}

/** [[SegTable]] + SQL DML: row-level operations (group-based
  * copy-on-write) and metadata TRUNCATE. */
class SegDmlTable(tschema: StructType, path: String)
    extends SegTable(tschema, path)
    with SupportsRowLevelOperations with TruncatableTable {

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new SegRowLevelOperation(path, tschema, info.command())
    }

  /** TRUNCATE TABLE: drop every segment, keep the table loadable (the
    * schema survives in the sidecar written here if none exists). */
  override def truncateTable(): Boolean = {
    val sc = Paths.get(path).resolve(".schema.json")
    if (!Files.exists(sc)) {
      Files.createDirectories(Paths.get(path))
      Files.write(sc, tschema.json.getBytes(UTF_8))
    }
    SegSource.listSegments(path).foreach(f =>
      Files.deleteIfExists(Paths.get(f)))
    true
  }
}

/** One DELETE/UPDATE/MERGE execution. The instance is the channel
  * between its scan and its write: the scan records the candidate
  * files it planned (the groups that MAY hold matching rows), the
  * write's commit replaces exactly that set. */
class SegRowLevelOperation(path: String, tschema: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {
  @volatile private[sources] var candidates: Seq[String] = Nil

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"gseg row-level $cmd path=$path"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SegGroupScanBuilder(tschema, path, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SegReplaceDataWrite(path, info.schema(), this)
}

/** Scan builder for a row-level operation. Spark's
  * GroupBasedRowLevelOperationScanPlanning pushes the ORIGINAL DML
  * condition here (not the rewrite plan's negation) — it is used
  * EXCLUSIVELY to prune whole segments via header zone maps; the
  * reader applies no row filter, because a group that contributes any
  * row must contribute all of them (kept rows ride through the
  * rewrite plan back into the replacement write). Unsupported
  * conjuncts just widen the candidate set — conservative, never
  * wrong. */
class SegGroupScanBuilder(full: StructType, path: String,
    op: SegRowLevelOperation) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SegSource.supportedFilter)
    filters // group pruning only: every filter is residual by contract
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val files = SegSource.listSegments(path)
    val cands = files.filter(f =>
      pushed.forall(SegSource.mayMatch(SegSource.headerOf(f), _)))
    op.candidates = cands
    graft.Counters.add("gseg_rlo_files_total", files.size.toLong)
    graft.Counters.add("gseg_rlo_candidates", cands.size.toLong)
    SegGroupScan(cands, required)
  }
}

/** All rows of the candidate groups, one partition per segment. */
case class SegGroupScan(files: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(SegInputPartition.apply).toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    SegReaderFactory(required, Array.empty, None) // group-complete read
  override def description(): String =
    s"gseg rlo group scan path over ${files.size} candidate file(s)"
}

/** The ReplaceData write: rewritten rows (kept / updated / merged)
  * stage as temp segments through the normal task-commit protocol;
  * job commit deletes the candidate generation and renames the new
  * one in. Empty task partitions stage nothing (skipEmpty) so a DML
  * touching 2 files doesn't mint 32 empty segments; if the swap
  * would leave the table with zero segments (everything deleted), a
  * single empty schema-bearing segment is written so the table stays
  * loadable. */
class SegReplaceDataWrite(path: String, schema: StructType,
    op: SegRowLevelOperation) extends WriteBuilder with Write
    with BatchWrite {
  override def build(): Write = this
  override def toBatch: BatchWrite = this

  /** Spark 4's group-based rewrite PREPENDS an operation-code column
    * (RowDeltaUtils.OPERATION_COLUMN, `__row_operation`) to the
    * replacement rows — the analyzed plan projects it even though
    * LogicalWriteInfo.schema() reports only the table columns.
    * Writers that track row provenance read it; this one projects it
    * away and persists the data columns. */
  private val dataSchema = StructType(
    schema.fields.filterNot(_.name == "__row_operation"))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    SegRloWriterFactory(
      SegWriterFactory(path, dataSchema, None, skipEmpty = true),
      dataSchema)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: SegCommitMessage => m }
    // temps are fully staged before any delete: an abort up to this
    // point leaves the old generation intact
    op.candidates.foreach(f => Files.deleteIfExists(Paths.get(f)))
    val gen = java.util.UUID.randomUUID.toString.take(8)
    msgs.foreach { m =>
      m.tmpFiles.zipWithIndex.foreach { case (tmp, i) =>
        Files.move(Paths.get(tmp),
          Paths.get(f"$path/rlo-$gen-${m.partitionId}%05d-$i%03d.gseg"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    }
    if (SegSource.listSegments(path).isEmpty)
      SegSource.writeSegment(Vector.empty, schema,
        s"$path/rlo-$gen-empty.gseg")
    graft.Counters.add("gseg_rlo_replaced_files",
      op.candidates.size.toLong)
    graft.Counters.add("gseg_rlo_new_files",
      msgs.map(_.tmpFiles.size.toLong).sum)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: SegCommitMessage => m }
      .foreach(_.tmpFiles.foreach(t => Files.deleteIfExists(Paths.get(t))))
}

/** Wraps the ordinary segment writer with a
  * [[org.apache.spark.sql.catalyst.ProjectingInternalRow]] that keeps
  * only the data ordinals. The incoming physical row is either
  * exactly the data columns (width n) or `__row_operation` + data
  * columns (width n+1, the group-based rewrite's shape) — decided on
  * the first row, since LogicalWriteInfo.schema() reports only the
  * table columns either way. Any other width is a loud error, never
  * a misaligned segment. */
private[sources] case class SegRloWriterFactory(inner: SegWriterFactory,
    dataSchema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val d = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val n = dataSchema.length
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      override def write(r: org.apache.spark.sql.catalyst.InternalRow)
          : Unit = {
        if (proj == null) {
          val off = r.numFields - n
          require(off == 0 || off == 1,
            s"gseg rlo write: row width ${r.numFields} vs $n data cols")
          proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
            dataSchema, (off until off + n).toIndexedSeq)
        }
        proj.project(r)
        d.write(proj)
      }
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
    }
  }
}

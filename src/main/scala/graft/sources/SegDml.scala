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
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
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
  * copy-on-write), metadata TRUNCATE, and the `_file` METADATA column
  * (SupportsMetadataColumns) — the handle runtime group filtering
  * prunes by: file names are the GROUP identity, so an In(_file, …)
  * built from the rows a DML actually matches selects exactly the
  * affected segments, with a broadcast set whose size is
  * #affected-files, never #matching-rows (the Iceberg `_file`
  * design; value-based filter attributes would broadcast data). */
class SegDmlTable(tschema: StructType, path: String)
    extends SegTable(tschema, path)
    with SupportsRowLevelOperations with TruncatableTable
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = SegSource.FileMetaName
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "segment file path of the row (group identity)"
    })

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

  /** Ask the rewrite to project `_file` into the read relation: the
    * runtime group-filtering rule resolves the scan's filter
    * attributes against it on both the pruning side (this scan) and
    * the build side (a regular batch scan of the original table). */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(SegSource.FileMetaName))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SegGroupScanBuilder(tschema, path, this)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SegReplaceDataWrite(path, info.schema(), this, cmd)
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
  private var emitFile: Boolean = false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(SegSource.supportedFilter)
    filters // group pruning only: every filter is residual by contract
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    emitFile =
      requiredSchema.fieldNames.contains(SegSource.FileMetaName)
    required = StructType(requiredSchema.fields
      .filterNot(_.name == SegSource.FileMetaName))
  }

  override def build(): Scan = {
    val files = SegSource.listSegments(path)
    val cands = files.filter(f =>
      pushed.forall(SegSource.mayMatch(SegSource.headerOf(f), _)))
    op.candidates = cands
    graft.Counters.add("gseg_rlo_files_total", files.size.toLong)
    graft.Counters.add("gseg_rlo_candidates", cands.size.toLong)
    new SegGroupScan(cands, required, emitFile, op)
  }
}

/** All rows of the candidate groups, one partition per segment.
  *
  * Implements SupportsRuntimeV2Filtering on the `_file` column, which
  * is what turns plan-time zone-map candidates into the EXACT
  * affected-group set: Spark's RowLevelOperationRuntimeGroupFiltering
  * rule runs the DML condition against the ORIGINAL table first (a
  * regular pruned/pushed gseg scan), collects the distinct `_file`
  * values of matching rows, and delivers them here as In(_file, …)
  * before planInputPartitions. Files outside the set provably hold no
  * matching row, so dropping them from BOTH the rewrite read and the
  * commit's replace set is lossless — and it is the only pruning
  * available when the condition is unpushable (MERGE's source-
  * dependent ON, subqueries, modulo math). At 100 TB this is the
  * difference between rewriting the table and rewriting the touched
  * files. Untranslatable predicates only ever WIDEN the set (never
  * wrong, only more copy-on-write). */
class SegGroupScan(allFiles: Seq[String], required: StructType,
    emitFile: Boolean, op: SegRowLevelOperation)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
  @volatile private var effective: Seq[String] = allFiles

  override def readSchema(): StructType =
    if (emitFile) StructType(required.fields :+
      StructField(SegSource.FileMetaName, org.apache.spark.sql.types
        .StringType, nullable = false))
    else required

  override def filterAttributes(): Array[
      org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column(SegSource.FileMetaName))

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val keep = predicates.flatMap(SegSource.predicateToFilter(_).toSeq)
      .collect {
        case org.apache.spark.sql.sources.In(a, vs)
            if a == SegSource.FileMetaName =>
          vs.collect { case s: String => s }.toSet
        case org.apache.spark.sql.sources.EqualTo(a, v: String)
            if a == SegSource.FileMetaName => Set(v)
      }
    if (keep.nonEmpty) {
      val allowed = keep.reduce(_ intersect _)
      effective = effective.filter(allowed.contains)
      op.candidates = effective
      graft.Counters.add("gseg_rlo_runtime_candidates",
        effective.size.toLong)
    }
  }

  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    effective.map(SegInputPartition.apply).toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory = {
    val inner = SegReaderFactory(required, Array.empty, None) // group-complete read
    if (emitFile) SegFileColumnFactory(inner) else inner
  }
  override def description(): String =
    s"gseg rlo group scan path over ${allFiles.size} candidate file(s)"
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
    op: SegRowLevelOperation, cmd: RowLevelOperation.Command)
    extends WriteBuilder with Write
    with BatchWrite {
  override def build(): Write = this
  override def toBatch: BatchWrite = this

  /** Spark 4's group-based rewrite PREPENDS an operation-code column
    * (RowDeltaUtils.OPERATION_COLUMN, `__row_operation`) to the
    * replacement rows, and the requested `_file` metadata column may
    * ride APPENDED — the analyzed plan projects them even when
    * LogicalWriteInfo.schema() reports only the table columns.
    * Writers that track row provenance read them; this one projects
    * them away and persists the data columns. */
  private val dataSchema = StructType(schema.fields.filterNot(f =>
    f.name == "__row_operation" || f.name == SegSource.FileMetaName))

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(path))
    if (sys.env.contains("GRAFT_RLO_DEBUG"))
      System.err.println(s"[rlo-debug] cmd=$cmd info.schema=" +
        schema.fieldNames.mkString(","))
    SegRloWriterFactory(
      SegWriterFactory(path, dataSchema, None, skipEmpty = true),
      dataSchema, cmd)
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
      SegSource.writeSegment(Vector.empty, dataSchema,
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
  * only the data ordinals. The incoming physical row is one of
  *   [data]               (width n)
  *   [op, data]           (n+1 — `__row_operation` PREPENDED by the
  *                         UPDATE/MERGE rewrites)
  *   [data, _file]        (n+1 — the requested metadata column
  *                         APPENDED, DELETE carries no op column)
  *   [op, data, _file]    (n+2)
  * decided on the first row, since LogicalWriteInfo.schema() reports
  * only the table columns either way: the n+1 ambiguity resolves by
  * COMMAND (DELETE never gets the op column). Any other width is a
  * loud error, never a misaligned segment. */
private[sources] case class SegRloWriterFactory(inner: SegWriterFactory,
    dataSchema: StructType, cmd: RowLevelOperation.Command)
    extends DataWriterFactory {
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
          val extra = r.numFields - n
          require(extra >= 0 && extra <= 2,
            s"gseg rlo write: row width ${r.numFields} vs $n data cols")
          val off = extra match {
            case 0 => 0
            case 1 => if (cmd == RowLevelOperation.Command.DELETE) 0 else 1
            case 2 => 1
          }
          if (sys.env.contains("GRAFT_RLO_DEBUG"))
            System.err.println(s"[rlo-debug] cmd=$cmd width=${r.numFields}" +
              s" n=$n off=$off")
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

package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

import graft.core.TxTable

/** Table-maintenance verbs as SQL stored procedures (the DSv2
  * `ProcedureCatalog` surface, Spark 4's `CALL` statement):
  *
  * {{{
  *   CALL graft.system.optimize(table => 'ns.t', target_bytes => 1048576)
  *   CALL graft.system.optimize(table => 'ns.t', where => 'day = 7')
  *   CALL graft.system.zorder(table => 'ns.t', cols => 'a,b')
  *   CALL graft.system.vacuum(table => 'ns.t', older_than_ms => 0, dry_run => true)
  *   CALL graft.system.restore(table => 'ns.t', version => 3)
  *   CALL graft.system.history(table => 'ns.t')
  *   CALL graft.system.detail(table => 'ns.t')
  *   CALL graft.system.truncate_log(table => 'ns.t')
  *   CALL graft.system.clone(source => 'ns.t', target => 'ns.t2')
  *   CALL graft.system.add_constraint(table => 'ns.t', name => 'k_pos', expr => 'k > 0')
  *   CALL graft.system.add_bloom_index(table => 'ns.t', col => 'k')
  *   CALL graft.system.add_generated_column(table => 'ns.t', name => 'd', expr => 'k * 2')
  *   CALL graft.system.add_identity_column(table => 'ns.t', name => 'id', start => 10)
  * }}}
  *
  * Each procedure routes to the corresponding one-commit ACID verb on
  * [[TxTable]] (compact / cluster / vacuum / restore / history /
  * detail / truncateLog / cloneTo) and returns its outcome as rows —
  * the same operational surface a warehouse operator scripts against,
  * without leaving SQL. Argument defaults are declared through the
  * DSv2 `DefaultValue` SQL forms, so `CALL` sites pass only what they
  * mean to change; results surface through a [[LocalScan]] (driver-side
  * rows — every result here is O(files) or O(commits) metadata, never
  * data rows).
  */
private[sql] abstract class GraftProcedure(
    val procName: String, params: Seq[ProcedureParameter], out: StructType)
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String = s"graft table maintenance: $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params.toArray
  // every procedure here mutates or inspects live table state
  override def isDeterministic: Boolean = false

  protected def run(spark: SparkSession, in: InternalRow): Seq[Row]

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val result = run(SparkSession.active, input)
    val conv = CatalystTypeConverters.createToCatalystConverter(out)
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] =
        result.map(r => conv(r).asInstanceOf[InternalRow]).toArray
      override def readSchema(): StructType = out
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  protected def str(in: InternalRow, i: Int): Option[String] =
    if (in.isNullAt(i)) None else Some(in.getUTF8String(i).toString)

  protected def reqStr(in: InternalRow, i: Int): String =
    str(in, i).getOrElse(throw new IllegalArgumentException(
      s"$procName: argument '${params(i).name}' must not be NULL"))
}

private[sql] object GraftProcedures {
  import ProcedureParameter.in

  private def p(name: String, dt: DataType) = in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String) =
    in(name, dt).defaultValue(default).build()

  /** Common result shape for the rewrite verbs: the commit the verb
    * produced (or the unchanged head) plus the live-file delta.
    */
  private val rewriteOut = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("files_before", LongType, nullable = false),
    StructField("files_after", LongType, nullable = false)))

  /** Result shape for the metadata-only DDL verbs: the commit the
    * declaration produced.
    */
  private val versionOut = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  def all(catalog: GraftCatalog): Seq[GraftProcedure] = Seq(
    new GraftProcedure("optimize", Seq(
        p("table", StringType),
        pd("target_bytes", LongType, (128L << 20).toString),
        pd("smaller_than", LongType, Long.MaxValue.toString),
        pd("where", StringType, "NULL")), rewriteOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        val before = t.detail()
        t.compact(in.getLong(1), in.getLong(2), str(in, 3).map(expr))
        val after = t.detail()
        Seq(Row(after.version, before.numFiles.toLong, after.numFiles.toLong))
      }
    },

    new GraftProcedure("zorder", Seq(
        p("table", StringType),
        p("cols", StringType),
        pd("target_files", IntegerType, "16"),
        pd("bits_per_col", IntegerType, "8")), rewriteOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        val cols = reqStr(in, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val before = t.detail()
        t.cluster(cols, in.getInt(2), in.getInt(3))
        val after = t.detail()
        Seq(Row(after.version, before.numFiles.toLong, after.numFiles.toLong))
      }
    },

    new GraftProcedure("vacuum", Seq(
        p("table", StringType),
        pd("retain_versions", IntegerType, "0"),
        pd("older_than_ms", LongType, "3600000"),
        pd("dry_run", BooleanType, "false")),
      StructType(Seq(StructField("path", StringType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.vacuum(in.getInt(1), in.getLong(2), in.getBoolean(3)).map(Row(_))
      }
    },

    new GraftProcedure("restore", Seq(
        p("table", StringType),
        p("version", LongType)),
      StructType(Seq(
        StructField("restored_to", LongType, nullable = false),
        StructField("version", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        val target = in.getLong(1)
        t.restore(target)
        Seq(Row(target, t.detail().version))
      }
    },

    new GraftProcedure("history", Seq(p("table", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("timestamp_ms", LongType, nullable = false),
        StructField("operation", StringType, nullable = false),
        StructField("files_added", IntegerType, nullable = false),
        StructField("files_removed", IntegerType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] =
        catalog.txFor(reqStr(in, 0)).history().map(ci =>
          Row(ci.version, ci.timestampMs, ci.operation, ci.filesAdded,
            ci.filesRemoved))
    },

    new GraftProcedure("detail", Seq(p("table", StringType)),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("num_files", IntegerType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("num_rows", LongType, nullable = true),
        StructField("num_columns", IntegerType, nullable = false),
        StructField("last_commit_ts", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val d = catalog.txFor(reqStr(in, 0)).detail()
        Seq(Row(d.version, d.numFiles, d.sizeBytes, d.numRows.orNull,
          d.numColumns, d.lastCommitTs))
      }
    },

    new GraftProcedure("truncate_log", Seq(p("table", StringType)),
      StructType(Seq(
        StructField("oldest_version", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.truncateLog()
        Seq(Row(t.history().headOption.map(_.version).getOrElse(-1L)))
      }
    },

    new GraftProcedure("clone", Seq(
        p("source", StringType),
        p("target", StringType)),
      StructType(Seq(
        StructField("target", StringType, nullable = false),
        StructField("version", LongType, nullable = false)))) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val targetName = reqStr(in, 1)
        val cloned = catalog.txFor(reqStr(in, 0))
          .cloneTo(catalog.newTableDir(targetName))
        Seq(Row(targetName, cloned.detail().version))
      }
    },

    // ---- typed-only DDL verbs (no ANSI SQL form) as procedures, so
    // the WHOLE table feature surface is SQL-scriptable ----

    new GraftProcedure("add_constraint", Seq(
        p("table", StringType),
        p("name", StringType),
        p("expr", StringType)), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.addConstraint(reqStr(in, 1), reqStr(in, 2))
        Seq(Row(t.detail().version))
      }
    },

    new GraftProcedure("drop_constraint", Seq(
        p("table", StringType),
        p("name", StringType)), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.dropConstraint(reqStr(in, 1))
        Seq(Row(t.detail().version))
      }
    },

    new GraftProcedure("add_bloom_index", Seq(
        p("table", StringType),
        p("col", StringType),
        pd("expected_items", LongType, "1000000"),
        pd("fpp", DoubleType, "0.03")), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.addBloomIndex(reqStr(in, 1), in.getLong(2), in.getDouble(3))
        Seq(Row(t.detail().version))
      }
    },

    new GraftProcedure("drop_bloom_index", Seq(
        p("table", StringType),
        p("col", StringType)), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.dropBloomIndex(reqStr(in, 1))
        Seq(Row(t.detail().version))
      }
    },

    new GraftProcedure("add_generated_column", Seq(
        p("table", StringType),
        p("name", StringType),
        p("expr", StringType)), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.addGeneratedColumn(reqStr(in, 1), reqStr(in, 2))
        Seq(Row(t.detail().version))
      }
    },

    new GraftProcedure("add_identity_column", Seq(
        p("table", StringType),
        p("name", StringType),
        pd("start", LongType, "1"),
        pd("step", LongType, "1")), versionOut) {
      override def run(spark: SparkSession, in: InternalRow): Seq[Row] = {
        val t = catalog.txFor(reqStr(in, 0))
        t.addIdentityColumn(reqStr(in, 1), in.getLong(2), in.getLong(3))
        Seq(Row(t.detail().version))
      }
    }
  )

  def load(catalog: GraftCatalog, ident: Identifier): GraftProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace " +
        s"(CALL ${catalog.name}.system.<proc>), got $ident")
    all(catalog).find(_.procName == ident.name).getOrElse(
      throw new IllegalArgumentException(
        s"no such procedure $ident — have: " +
          all(catalog).map(_.procName).sorted.mkString(", ")))
  }
}

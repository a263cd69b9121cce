package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 [[TableCatalog]] over commit-log tables — the catalog role the
  * reference delegates to Glue (`staging_to_curated.py:122-134` creates
  * there, `utils.py:72-83` registers, `purchase_orders.py:22-24` queries
  * by name), expressed as Spark's own plugin point:
  *
  * {{{
  *   spark.sql.catalog.graft = graft.lake.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = <shared storage path>
  * }}}
  *
  * after which `graft.db.t` resolves through Spark's catalog paths with
  * no per-session registration: `CREATE NAMESPACE` / `CREATE TABLE` /
  * CTAS / `INSERT INTO` / `INSERT OVERWRITE [PARTITION (p = 'x')]` (the
  * scoped form lands as an atomic partition replace, not a full-table
  * rewrite) / `SELECT` / `DELETE FROM` / `DROP` / `SHOW TABLES`, plus
  * `VERSION AS OF` / `TIMESTAMP AS OF` time travel via the loadTable
  * overloads. With the engine's extensions on
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, or
  * `GraftExtensions.register(spark)` at runtime) plain `spark.sql`
  * UPDATE / MERGE / arbitrary-predicate DELETE also execute natively:
  * [[GraftDmlStrategy]] claims those plans and runs the commit log's
  * row-level commits — stats-pruned rewrites or deletion vectors,
  * cheaper than the SupportsRowLevelOperations connector rewrite Spark
  * would otherwise demand. Without extensions they keep the
  * [[TxLogSql]] spelling, which resolves catalog identifiers too (as do
  * the maintenance statements: DESCRIBE HISTORY/DETAIL, VACUUM,
  * OPTIMIZE).
  *
  * Durability is the WAREHOUSE ITSELF, not a driver-side registry: a
  * namespace is a directory holding a `_graft_db.json` marker, a table
  * is a directory holding a `_graft_table.json` descriptor (layout +
  * properties + optional external location) next to (or pointing at) its
  * commit log. Any session on any machine pointed at the same warehouse
  * sees the same catalog — the Glue-as-shared-metastore topology — and
  * there is no second source of truth to drift from the logs.
  *
  * Scale: every operation here is O(1) metadata IO (one marker read) or
  * one directory listing; nothing reads data files or log tails beyond
  * what [[TxLog]]'s own checkpointed resolve pays.
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  // resolved PER CALL, not captured at initialize: the plugin is
  // instantiated lazily by whichever thread first references the
  // catalog, and a captured session would pin every later operation —
  // possibly issued from another thread or a cloned session — to it
  private def spark: SparkSession = SparkSession.active

  private val DbMarker = "_graft_db.json"
  private val TableMarker = "_graft_table.json"

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"catalog '$name' (graft.lake.GraftCatalog) needs a warehouse: " +
          s"set spark.sql.catalog.$name.warehouse to a shared storage path"))
  }

  override def name(): String = catalogName

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(namespace: Array[String]): Path = {
    // one level, like a database: the warehouse layout IS the catalog
    // state, and nested namespaces would make a table dir ambiguous with
    // a namespace dir at list time
    if (namespace.length != 1)
      throw new NoSuchNamespaceException(namespace)
    new Path(s"$warehouse/${namespace.head}")
  }

  private def tableDir(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), ident.name())

  // ---- namespaces ----------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && {
      val p = new Path(nsPath(namespace), DbMarker)
      fs(p).exists(p)
    }

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) return Array.empty
    f.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, DbMarker)))
      .map(p => Array(p.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // no nesting
    else throw new NoSuchNamespaceException(namespace)

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val p = new Path(nsPath(namespace), DbMarker)
    graft.Json.parseStringMap(readUtf8(p)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespace.length != 1)
      throw new IllegalArgumentException(
        s"graft catalog namespaces are single-level (a database); got " +
          namespace.mkString("."))
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    val marker = new Path(nsPath(namespace), DbMarker)
    writeUtf8(marker, graft.Json.renderStringMap(
      metadata.asScala.toMap), overwrite = false)
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = {
    val current = loadNamespaceMetadata(namespace).asScala.toMap
    val updated = changes.foldLeft(current) {
      case (m, set: NamespaceChange.SetProperty) =>
        m + (set.property() -> set.value())
      case (m, rm: NamespaceChange.RemoveProperty) => m - rm.property()
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported namespace change $other")
    }
    writeUtf8(new Path(nsPath(namespace), DbMarker),
      graft.Json.renderStringMap(updated), overwrite = true)
  }

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    if (!cascade && listTables(namespace).nonEmpty)
      // Spark's own catalog error contract (error-class handlers and
      // SQL clients match on this type, not IllegalStateException)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(namespace)
    fs(nsPath(namespace)).delete(nsPath(namespace), true)
  }

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    val dir = nsPath(namespace)
    val f = fs(dir)
    f.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => f.exists(new Path(p, TableMarker)))
      .map(p => Identifier.of(namespace, p.getName)).sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && {
      val p = new Path(tableDir(ident), TableMarker)
      fs(p).exists(p)
    }

  /** The durable descriptor: write layout + properties + where the commit
    * log lives (absent location = managed, the table dir itself). The
    * `graft.statsCols` property (comma list, settable at CREATE or via
    * SET TBLPROPERTIES) opts the table's writes into per-file skipping
    * stats — what makes the pruning and metadata-aggregate tiers engage
    * on catalog-authored tables.
    */
  private case class Descriptor(location: Option[String],
                                partitionCols: Seq[String],
                                properties: Map[String, String]) {
    def root(ident: Identifier): String =
      location.getOrElse(tableDir(ident).toString)
    def statsCols: Seq[String] = properties.get(GraftCatalog.StatsColsProp)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
  }

  private def readDescriptor(ident: Identifier): Descriptor = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val m = graft.Json.parseStringMap(
      readUtf8(new Path(tableDir(ident), TableMarker)))
    Descriptor(
      m.get("location").filter(_.nonEmpty),
      m.get("partitionCols").map(_.split(",").toSeq.filter(_.nonEmpty))
        .getOrElse(Seq.empty),
      m.removedAll(Seq("location", "partitionCols")))
  }

  override def loadTable(ident: Identifier): Table =
    loadPinned(ident, None)

  // `SELECT ... VERSION AS OF <v>`
  override def loadTable(ident: Identifier, version: String): Table =
    loadPinned(ident, Some(version.toLong))

  // `SELECT ... TIMESTAMP AS OF <ts>` — Spark hands MICROseconds
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val d = readDescriptor(ident)
    loadPinned(ident, Some(
      TxLog.versionAtTimestamp(spark, d.root(ident), timestamp / 1000L)))
  }

  private def loadPinned(ident: Identifier, asOf: Option[Long]): Table = {
    val d = readDescriptor(ident)
    val root = d.root(ident)
    // pin the snapshot at analysis (the getTable rule, same reason:
    // execution re-resolving LATEST under a raced schema change would
    // emit rows that no longer match the analyzed schema). loadTable runs
    // per statement, so the next statement follows new commits.
    val pinned = asOf.orElse(TxLog.currentVersion(spark, root))
    new GraftCatalogTable(s"$catalogName.${ident.namespace().head}." +
      ident.name(), root, pinned, d.partitionCols, d.statsCols,
      d.properties, explicitAsOf = asOf.isDefined)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException(ident.namespace())
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partitionCols = partitions.toSeq.map {
      case t if t.name == "identity" && t.references().length == 1 =>
        t.references()(0).fieldNames().mkString(".")
      case other => throw new UnsupportedOperationException(
        s"graft catalog: only identity PARTITIONED BY columns are " +
          s"supported, got $other")
    }
    val props = properties.asScala.toMap
    val location = props.get(TableCatalog.PROP_LOCATION)
    val kept = props -- Seq(TableCatalog.PROP_LOCATION,
      TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      "option.path", "path")
    rejectReservedProps(kept.keySet)
    val root = location.getOrElse(tableDir(ident).toString)
    // marker FIRST (create-without-overwrite is the atomic claim): a
    // racing CREATE of the same name fails here before touching any
    // commit log — committing first would let the loser's
    // schema-bearing append land in the WINNER's table history. A crash
    // after the claim leaves a committed-state-less entry that reads
    // fail on loudly and DROP removes; never a polluted log.
    val desc = Map("partitionCols" -> partitionCols.mkString(",")) ++
      location.map("location" -> _) ++ kept
    writeUtf8(new Path(tableDir(ident), TableMarker),
      graft.Json.renderStringMap(desc), overwrite = false)
    // the first commit carries the declared schema with ZERO data files
    // (the Delta CREATE shape): an empty DataFrame append would commit
    // one stats-less empty part file, permanently disqualifying the
    // table from the metadata-only COUNT/MIN/MAX tier (which requires
    // EVERY live file to carry the stat). Later INSERTs evolve/validate
    // through TxLog.append's own schema policy; partition columns are
    // derived from their committed paths. An EXTERNAL location that
    // already holds a committed table is adopted as-is (the register-
    // existing-data path, utils.py:72-83's role).
    try {
      if (TxLog.currentVersion(spark, root).isEmpty)
        TxLog.commitMetadataOnly(spark, root, Seq.empty, Map.empty,
          schema.toDDL)
    } catch {
      case t: Throwable =>
        // undo the claim so a corrected CREATE can retry cleanly
        try {
          fs(tableDir(ident)).delete(
            new Path(tableDir(ident), TableMarker), false); ()
        } catch { case u: Throwable => t.addSuppressed(u) }
        throw t
    }
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = readDescriptor(ident)
    val root = d.root(ident)
    // property changes FOLD across the statement (a multi-property SET
    // TBLPROPERTIES is one alterTable call with several changes — a
    // per-change marker write from the pre-statement descriptor would
    // keep only the last) and land as ONE marker write
    val updatedProps = changes.foldLeft(d.properties) {
      case (props, set: TableChange.SetProperty) =>
        rejectReservedProps(Set(set.property()))
        props + (set.property() -> set.value())
      case (props, rm: TableChange.RemoveProperty) => props - rm.property()
      case (props, add: TableChange.AddColumn)
          if add.fieldNames().length == 1 =>
        TxLog.addColumns(spark, root,
          Seq(add.fieldNames()(0) -> add.dataType().sql))
        props
      case (props, rn: TableChange.RenameColumn)
          if rn.fieldNames().length == 1 =>
        TxLog.renameColumn(spark, root, rn.fieldNames()(0), rn.newName())
        props
      case (props, del: TableChange.DeleteColumn)
          if del.fieldNames().length == 1 =>
        TxLog.dropColumns(spark, root, Seq(del.fieldNames()(0)))
        props
      case (_, other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported table change $other — column type " +
          "changes go through TxLog.alterColumnType (lossless widenings)")
    }
    if (updatedProps != d.properties) {
      val desc = Map("partitionCols" -> d.partitionCols.mkString(",")) ++
        d.location.map("location" -> _) ++ updatedProps
      writeUtf8(new Path(tableDir(ident), TableMarker),
        graft.Json.renderStringMap(desc), overwrite = true)
    }
    loadTable(ident)
  }

  /** The durable table marker serializes its OWN fields ("partitionCols",
    * "location") in the same flat map as user TBLPROPERTIES — a user
    * property under either name would silently overwrite the real
    * partition layout / root at the next loadTable, so both are reserved
    * and rejected loudly at CREATE and SET TBLPROPERTIES. ('location' is
    * normally consumed by Spark as PROP_LOCATION before reaching here;
    * this guards the paths that hand properties through verbatim.)
    */
  private def rejectReservedProps(keys: Set[String]): Unit = {
    val hit = keys.intersect(Set("partitionCols", "location"))
    if (hit.nonEmpty) throw new IllegalArgumentException(
      s"table propert${if (hit.size == 1) "y" else "ies"} " +
        s"${hit.mkString(", ")} ${if (hit.size == 1) "is" else "are"} " +
        "reserved by the graft catalog's table descriptor — choose " +
        "another property name")
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    // managed data lives in the table dir and goes with it; an external
    // location is the user's — only the catalog entry is dropped
    fs(tableDir(ident)).delete(tableDir(ident), true)
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace()))
      throw new NoSuchNamespaceException(newIdent.namespace())
    val d = readDescriptor(oldIdent)
    if (d.location.isEmpty) {
      // managed: the dir IS the table — one atomic-on-HDFS dir rename
      if (!fs(tableDir(oldIdent)).rename(tableDir(oldIdent),
          tableDir(newIdent)))
        throw new IllegalStateException(
          s"rename ${tableDir(oldIdent)} -> ${tableDir(newIdent)} failed")
    } else {
      // external: move the descriptor, data stays put
      writeUtf8(new Path(tableDir(newIdent), TableMarker),
        readUtf8(new Path(tableDir(oldIdent), TableMarker)),
        overwrite = false)
      fs(tableDir(oldIdent)).delete(tableDir(oldIdent), true)
    }
  }

  /** [[TxLogSql]]'s hook: resolve a table this catalog serves to the DML
    * registration shape (root + write layout), or None when absent — what
    * lets `UPDATE cat.db.t SET ...` / `MERGE INTO cat.db.t ...` execute
    * against the commit log with no per-session register() call.
    */
  private[lake] def dmlRegistration(ident: Identifier)
      : Option[TxLogSql.Registration] =
    if (!tableExists(ident)) None
    else {
      val d = readDescriptor(ident)
      Some(TxLogSql.Registration(d.root(ident), d.partitionCols,
        d.statsCols))
    }

  // ---- small durable-marker IO ----------------------------------------

  private def readUtf8(p: Path): String = {
    val in = fs(p).open(p)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  private def writeUtf8(p: Path, s: String, overwrite: Boolean): Unit = {
    val out = fs(p).create(p, overwrite)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

/** A catalog-addressed commit-log table: reads reuse the connector's
  * pruning scan ([[GraftScanBuilder]] — stats + bloom file skipping,
  * metadata-only aggregates), writes land as ACID commits through a
  * V1Write ([[TxLog.append]]/[[TxLog.overwrite]]), and `DELETE FROM`
  * executes as the commit log's own stats-pruned rewrite.
  */
private[lake] final class GraftCatalogTable(fullName: String,
                                            root: String,
                                            pinnedVersion: Option[Long],
                                            partitionCols: Seq[String],
                                            statsCols: Seq[String],
                                            props: Map[String, String],
                                            explicitAsOf: Boolean = false)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private def spark = SparkSession.active

  // the DML strategy's seam (graft.lake is private; the strategy is
  // injected from graft.plans)
  private[graft] def txRoot: String = root
  private[graft] def txPartitionCols: Seq[String] = partitionCols
  private[graft] def txStatsCols: Seq[String] = statsCols
  // the streaming bridge declines EXPLICITLY time-traveled tables
  // (streaming a frozen snapshot is a contradiction; Spark's own refusal
  // stays) — NOT the ordinary analysis-time snapshot pin, which every
  // loadTable applies
  private[graft] def isTimeTravelPinned: Boolean = explicitAsOf

  override def name(): String = fullName

  override lazy val schema: StructType =
    TxLog.schemaOf(spark, root, pinnedVersion)

  override def partitioning(): Array[Transform] =
    partitionCols.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    (props + (TableCatalog.PROP_LOCATION -> root)).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      // `INSERT OVERWRITE` under partitionOverwriteMode=dynamic: the
      // plan (OverwritePartitionsDynamic) has no V1 fallback exec, so
      // it executes through GraftDmlStrategy -> TxLog.upsertPartitions
      // (registered by GraftExtensions, like SQL UPDATE/MERGE/DELETE).
      // BATCH_WRITE rides along because TableCapabilityCheck demands it
      // STRICTLY (not via the V1 alias) for dynamic overwrite; physical
      // planning keys off the Write instance (always our V1Write), so
      // every other write path is unchanged by advertising it
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.BATCH_WRITE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val m = new util.HashMap[String, String](opts.asCaseSensitiveMap())
    m.put("root", root)
    pinnedVersion.foreach(v => m.put("versionAsOf", v.toString))
    new GraftScanBuilder(schema, new CaseInsensitiveStringMap(m))
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsOverwrite
      with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      // None = append; Some(empty/AlwaysTrue) = whole-table replace;
      // Some(partition equalities) = scoped replacePartitions — how
      // `INSERT OVERWRITE t PARTITION (p = 'x')` lands as an atomic
      // partition replace instead of a full-table rewrite
      private var overwriteBy: Option[Array[Filter]] = None
      // accepted so the optimizer's V2Writes builds the plan instead of
      // refusing; the execution itself is GraftDmlStrategy's claim of
      // OverwritePartitionsDynamic (there is no V1 fallback exec for
      // dynamic overwrite), dispatching TxLog.upsertPartitions — the
      // snapshot-atomic replace of exactly the partitions in the batch
      override def overwriteDynamicPartitions(): WriteBuilder = this
      override def truncate(): WriteBuilder = {
        overwriteBy = Some(Array.empty); this
      }
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        overwriteBy = Some(filters); this
      }
      override def canOverwrite(filters: Array[Filter]): Boolean =
        // only scopes the commit log can replace EXACTLY: anything it
        // cannot re-apply verbatim is declined (Spark then reports the
        // unsupported overwrite instead of this table replacing loosely)
        filters.forall {
          case _: org.apache.spark.sql.sources.AlwaysTrue => true
          case f => GraftDataSource.toColumn(f).isDefined
        }
      override def build(): V1Write = new V1Write {
        // the ONLY path that reaches toBatch on this V1 write is a
        // dynamic partition overwrite planned WITHOUT the strategy
        // (every other plan shape has a V1 exec): turn Spark's generic
        // unsupported-operation failure into the actionable one
        override def toBatch
            : org.apache.spark.sql.connector.write.BatchWrite =
          throw new IllegalStateException(
            "dynamic partition overwrite on graft tables executes " +
              "through the injected planner strategy — set " +
              "spark.sql.extensions=graft.plans.GraftExtensions, or " +
              "call GraftExtensions.register(spark) first")
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: org.apache.spark.sql.DataFrame,
                                overwrite: Boolean): Unit = overwriteBy match {
              case None =>
                if (overwrite)
                  TxLog.overwrite(spark, data, root, partitionCols, statsCols)
                else TxLog.append(spark, data, root, partitionCols, statsCols)
              case Some(fs0) =>
                val fs1 = fs0.filterNot(
                  _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
                // EqualNullSafe included: the static value of
                // `INSERT OVERWRITE t PARTITION (p = 'x')` arrives from
                // V2Writes as `p <=> 'x'` — for a NON-NULL value that is
                // the same partition equality, and routing it here keeps
                // the Hive spelling on the metadata-scoped atomic path
                // instead of the row-scoped replaceWhere rewrite
                def isPartitionEq(f: Filter) = f match {
                  case EqualTo(a, v) => v != null &&
                    partitionCols.exists(_.equalsIgnoreCase(a))
                  case EqualNullSafe(a, v) => v != null &&
                    partitionCols.exists(_.equalsIgnoreCase(a))
                  case _ => false
                }
                if (fs1.isEmpty)
                  TxLog.overwrite(spark, data, root, partitionCols, statsCols)
                else if (fs1.forall(isPartitionEq))
                  // partition equalities: metadata-scoped atomic replace
                  TxLog.replacePartitions(spark, data, root, fs1.collect {
                    case EqualTo(a, v) =>
                      partitionCols.find(_.equalsIgnoreCase(a))
                        .getOrElse(a) -> String.valueOf(v)
                    case EqualNullSafe(a, v) =>
                      partitionCols.find(_.equalsIgnoreCase(a))
                        .getOrElse(a) -> String.valueOf(v)
                  }.toMap, statsCols)
                else {
                  // arbitrary translatable predicate (REPLACE WHERE /
                  // writeTo().overwrite(cond)): the commit log's
                  // row-scoped replace — matched files rewritten,
                  // survivors carried over, one ACID commit
                  val cond = fs1.toSeq
                    .map(GraftCatalog.exactColumn(_, "overwrite"))
                    .reduce(_ && _)
                  TxLog.replaceWhere(spark, data, root, cond, statsCols)
                }
            }
          }
      }
    }

  // `DELETE FROM graft.db.t WHERE ...` — only when every conjunct
  // translates exactly (else Spark errors rather than deleting loosely;
  // the TxLogSql/TxLog.delete spellings take arbitrary Column predicates)
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftDataSource.toColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    // every conjunct must translate EXACTLY — canDeleteWhere gated this,
    // but dropping an untranslatable filter here would widen the delete
    // scope silently if any caller ever bypasses the gate
    val cond = filters.toSeq
      .map(GraftCatalog.exactColumn(_, "DELETE"))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    TxLog.delete(spark, root, cond, statsCols)
  }
}

private[graft] object GraftCatalog {

  /** Table property opting writes into per-file skipping stats (comma
    * list of columns): `TBLPROPERTIES ('graft.statsCols' = 'k,price')`.
    */
  val StatsColsProp = "graft.statsCols"

  private[lake] def exactColumn(f: Filter,
                                what: String): org.apache.spark.sql.Column =
    GraftDataSource.toColumn(f).getOrElse(throw new IllegalStateException(
      s"graft catalog: $what filter $f is not exactly translatable — " +
        "refusing to widen the scope"))
}

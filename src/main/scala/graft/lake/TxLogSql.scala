package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftnative.{parsePlan, planToDf, toColumn}

/** SQL DML surface over [[TxLog]] tables: `MERGE INTO` / `DELETE FROM` /
  * `UPDATE` statements, parsed by Spark's OWN SQL grammar and dispatched
  * to the commit-log row-level operations — closing the reference's
  * "everything is reachable through SQL" contract
  * (`purchase_orders.py:22-24`) for writes the way [[TxLog.createView]]
  * closes it for reads.
  *
  * Why not a string rewrite: Spark's parser already turns these
  * statements into typed logical plans (`DeleteFromTable`, `UpdateTable`,
  * `MergeIntoTable`) — only their EXECUTION is reserved for DSv2 tables.
  * Pattern-matching the parsed plan gets real grammar (quoting, aliases,
  * arbitrary predicate expressions) for free and fails loudly on shapes
  * the commit log cannot honor, where a regex would mis-parse silently.
  *
  * Usage: [[register]] a table once (name -> log root + layout); the name
  * then works in DML text AND as a `spark.sql` view for reads. Each
  * successful statement commits ONE TxLog version and re-registers the
  * read view at the new snapshot.
  *
  * Supported shapes (the commit log's row-level semantics):
  *   - `DELETE FROM t WHERE <predicate>`
  *   - `UPDATE t SET c1 = <expr>, ... [WHERE <predicate>]`
  *   - `MERGE INTO t USING <source> ON t.k1 = s.k1 [AND ...]
  *      WHEN MATCHED THEN UPDATE SET *
  *      WHEN NOT MATCHED THEN INSERT *`
  *     (whole-row upsert by equi-key — [[TxLog.merge]]'s contract; clause
  *     conditions, partial-column actions, and NOT MATCHED BY SOURCE are
  *     rejected with an explanatory error)
  */
object TxLogSql {

  /** A registered DML target: where its commit log lives and the write
    * layout every DML rewrite must preserve.
    */
  final case class Registration(root: String, partitionCols: Seq[String],
                                statsCols: Seq[String])

  private val registry =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Registration]

  /** Bind `name` to a TxLog root for this session: DML statements resolve
    * the name through this registry, and a same-named temp view is
    * (re-)created at the latest snapshot so SELECTs see every commit.
    */
  def register(spark: SparkSession, name: String, root: String,
               partitionCols: Seq[String] = Seq.empty,
               statsCols: Seq[String] = Seq.empty): Unit = {
    registry((spark, normalize(name))) =
      Registration(root, partitionCols, statsCols)
    TxLog.createView(spark, name, root)
  }

  /** Execute one DML statement; returns the committed TxLog version (for
    * an UPDATE/DELETE matching nothing: the current version — the log
    * commits no empty rewrite). The target's read view is refreshed to
    * the post-statement snapshot.
    */
  def execute(spark: SparkSession, sqlText: String): Long = {
    val version = parsePlan(spark, sqlText) match {

      case d: DeleteFromTable =>
        val (name, reg) = target(spark, d.table, sqlText)
        val v = TxLog.delete(spark, reg.root,
          toColumn(unqualify(d.condition)), reg.statsCols)
        refresh(spark, name, reg); v

      case u: UpdateTable =>
        val (name, reg) = target(spark, u.table, sqlText)
        val cond = u.condition.map(c => toColumn(unqualify(c)))
          .getOrElse(lit(true))
        val set = u.assignments.map { a =>
          attrName(a.key, sqlText) -> toColumn(unqualify(a.value))
        }.toMap
        require(set.size == u.assignments.size,
          s"duplicate SET column in: $sqlText")
        val v = TxLog.update(spark, reg.root, cond, set, reg.statsCols)
        refresh(spark, name, reg); v

      case m: MergeIntoTable =>
        val (name, reg) = target(spark, m.targetTable, sqlText)
        // the commit log's merge is a whole-row upsert by key: exactly
        // UPDATE SET * / INSERT * with no clause conditions
        m.matchedActions match {
          case Seq(UpdateStarAction(None)) => ()
          case other => fail(sqlText, s"unsupported WHEN MATCHED $other — " +
            "the commit-log merge is a whole-row upsert: use UPDATE SET *")
        }
        m.notMatchedActions match {
          case Seq(InsertStarAction(None)) => ()
          case other => fail(sqlText, s"unsupported WHEN NOT MATCHED $other — " +
            "use INSERT *")
        }
        if (m.notMatchedBySourceActions.nonEmpty)
          fail(sqlText, "WHEN NOT MATCHED BY SOURCE is not supported")
        val keys = keyCols(m.mergeCondition, sqlText)
        val v = TxLog.merge(spark, planToDf(spark, m.sourceTable), reg.root,
          keys, reg.partitionCols, reg.statsCols)
        refresh(spark, name, reg); v

      case other =>
        fail(sqlText, s"not a DML statement this surface executes " +
          s"(${other.getClass.getSimpleName}); reads go through the " +
          "registered view via spark.sql")
    }
    version
  }

  // -----------------------------------------------------------------------

  private def normalize(name: String): String = name.toLowerCase

  private def refresh(spark: SparkSession, name: String,
                      reg: Registration): Unit =
    TxLog.createView(spark, name, reg.root)

  /** Unwrap the parsed target relation (possibly aliased:
    * `MERGE INTO t AS x`) to its registered name + registration.
    */
  @annotation.tailrec
  private def target(spark: SparkSession, plan: LogicalPlan,
                     sqlText: String): (String, Registration) = plan match {
    case a: SubqueryAlias => target(spark, a.child, sqlText)
    case r: UnresolvedRelation =>
      val name = normalize(r.multipartIdentifier.last)
      registry.get((spark, name)) match {
        case Some(reg) => (name, reg)
        case None => fail(sqlText,
          s"table '${r.multipartIdentifier.mkString(".")}' is not " +
            "TxLogSql-registered; call TxLogSql.register first")
      }
    case other =>
      fail(sqlText, s"unsupported DML target ${other.getClass.getSimpleName}")
  }

  /** Strip alias qualifiers from attribute references (`t.c_acctbal` ->
    * `c_acctbal`): DML predicates evaluate against the snapshot frame,
    * which carries the table's columns but not the statement's alias.
    */
  private def unqualify(e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute if a.nameParts.size > 1 =>
      UnresolvedAttribute(Seq(a.nameParts.last))
  }

  private def attrName(e: Expression, sqlText: String): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case other => fail(sqlText,
      s"SET target must be a column, got ${other.getClass.getSimpleName}")
  }

  /** MERGE key columns from the ON condition: a conjunction of
    * `target.k = source.k` equalities over the SAME column name on both
    * sides — [[TxLog.merge]] joins by key equality, so any other
    * condition shape cannot be honored.
    */
  private def keyCols(cond: Expression, sqlText: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo}
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case leaf => Seq(leaf)
    }
    split(cond).map {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
        l.nameParts.last
      case other => fail(sqlText,
        s"MERGE ON must be a conjunction of t.k = s.k equalities over " +
          s"the same column name; got: ${other.sql}")
    }.distinct
  }

  private def fail(sqlText: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$msg\n  in statement: $sqlText")
}

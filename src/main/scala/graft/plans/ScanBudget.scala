package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Per-query scan budget — the engine-native analog of the reference's
  * Athena workgroup cost cap (`BytesScannedCutoffPerQuery: 107374182400`,
  * serverless.yml:422): a query whose PLANNED file-scan bytes exceed the
  * configured budget fails before reading anything, instead of running up
  * a 100 TB bill.
  *
  * The planned bytes are measured where Athena measures billed bytes —
  * after partition pruning: each `FileSourceScanExec`'s selected-partition
  * listing (`ScanFileListing.totalFileSize`), so a query that prunes to
  * one partition is charged one partition, and adding a partition filter
  * genuinely buys budget headroom. Row-group/page pruning inside the
  * files is NOT credited (unknowable before IO) — the cap is conservative
  * in exactly the way Athena's is.
  *
  * Two enforcement surfaces:
  *   - automatic: [[ScanBudgetRule]] via
  *     `spark.sql.extensions=graft.plans.GraftExtensions` + the session
  *     conf `spark.graft.scanBudget.bytes` — every AQE query (Spark 4
  *     default) is checked at query-stage preparation;
  *   - explicit: [[ScanBudget.check]] / [[ScanBudget.plannedScanBytes]]
  *     on any DataFrame, for non-AQE plans and for tooling that wants the
  *     number without enforcement (cost preview, CI assertions).
  */
object ScanBudget {

  /** Session conf: planned-scan-bytes cap per query. Unset or empty = no
    * cap (mirrors an Athena workgroup without a cutoff).
    */
  val ConfKey = "spark.graft.scanBudget.bytes"

  final class ScanBudgetExceededException(val plannedBytes: Long,
                                          val budgetBytes: Long)
      extends RuntimeException(
        s"query plans to scan $plannedBytes bytes, over the " +
          s"$ConfKey budget of $budgetBytes " +
          "(add partition/file-skipping filters, or raise the budget)")

  /** Post-pruning file bytes this physical plan will read: every file
    * source scan's selected-partition listing, recursing through AQE
    * wrappers (a leaf node hiding the real plan) and subquery plans
    * (a scalar subquery scans real bytes too). Scans are deduplicated by
    * INSTANCE: under AQE, dynamic-partition-pruning rewires a scan's
    * filter to a subquery holding the join's OWN build-side exchange, so
    * a naive sum counts that side twice — once in the join subtree, once
    * through the subquery — and a query genuinely under budget would be
    * spuriously killed. One physical scan = one charge.
    */
  def plannedScanBytes(plan: SparkPlan): Long = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[FileSourceScanExec, java.lang.Boolean]())
    // commit-log table scans (format("graft") / catalog identifiers)
    // plan as RowDataSourceScanExec over the V1-fallback relation — an
    // opaque RDD with no selectedPartitions. The relation exposes its
    // own post-pruning planned bytes (same stats+bloom tiers the scan
    // applies), so a graft scan is charged like a file scan instead of
    // slipping under the cap at zero.
    val seenGraft = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[graft.lake.GraftRelation, java.lang.Boolean]())
    def visit(p: SparkPlan): Unit = p.foreach { node =>
      node match {
        case f: FileSourceScanExec => seen.add(f); ()
        case r: org.apache.spark.sql.execution.RowDataSourceScanExec =>
          r.relation match {
            case g: graft.lake.GraftRelation => seenGraft.add(g); ()
            case _ => ()
          }
        case a: AdaptiveSparkPlanExec => visit(a.inputPlan)
        case _ => ()
      }
      node.expressions.foreach(_.foreach {
        case e: org.apache.spark.sql.execution.ScalarSubquery =>
          visit(e.plan.child)
        case e: org.apache.spark.sql.execution.InSubqueryExec =>
          visit(e.plan.child)
        case _ => ()
      })
    }
    visit(plan)
    var total = 0L
    seen.forEach(f => total += f.selectedPartitions.totalFileSize)
    seenGraft.forEach(g => total += g.plannedScanBytes)
    total
  }

  /** The budget rule skips enforcement while a PREVIEW materializes the
    * plan: `plannedScanBytes(df)` is documented as "the number without
    * enforcement", but materializing `executedPlan` on an
    * extension-installed session runs the AQE prep rules eagerly — the
    * preview itself would throw on the very query it exists to measure.
    * Thread-local because the prep rules run on the materializing thread.
    */
  private val previewing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }
  private[plans] def isPreviewing: Boolean = previewing.get()

  /** Planned post-pruning scan bytes of a DataFrame (no enforcement). */
  def plannedScanBytes(df: DataFrame): Long = {
    previewing.set(true)
    try plannedScanBytes(df.queryExecution.executedPlan)
    finally previewing.set(false)
  }

  /** Enforce the session's configured budget (no-op when unset) against a
    * DataFrame about to run. Returns the planned bytes.
    */
  def check(df: DataFrame): Long = {
    val planned = plannedScanBytes(df)
    confBudget(df.sparkSession).foreach { budget =>
      if (planned > budget)
        throw new ScanBudgetExceededException(planned, budget)
    }
    planned
  }

  /** The session's configured budget, validated; None = uncapped. Public
    * for tooling that reports the budget next to a preview (e.g. the SQL
    * surface's `DESCRIBE SCAN`).
    */
  def confBudget(session: SparkSession): Option[Long] =
    Option(session.conf.get(ConfKey, null)).map(_.trim).filter(_.nonEmpty)
      .map { s =>
        val v =
          try s.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$ConfKey must be a plain byte count (digits only), got " +
                s"'$s' — human units like '100GB' are not parsed")
          }
        require(v > 0, s"$ConfKey must be positive, got $v")
        v
      }
}

/** Query-stage-preparation rule: fails any adaptive query whose planned
  * scan exceeds `spark.graft.scanBudget.bytes`. Stage prep re-runs on AQE
  * re-optimization; that is safe — completed stages are replaced by
  * stage leaves, so the remaining planned bytes only shrink.
  */
case class ScanBudgetRule(session: SparkSession) extends Rule[SparkPlan] {
  override def apply(plan: SparkPlan): SparkPlan = {
    if (!ScanBudget.isPreviewing) {
      ScanBudget.confBudget(session).foreach { budget =>
        val planned = ScanBudget.plannedScanBytes(plan)
        if (planned > budget)
          throw new ScanBudget.ScanBudgetExceededException(planned, budget)
      }
    }
    plan
  }
}

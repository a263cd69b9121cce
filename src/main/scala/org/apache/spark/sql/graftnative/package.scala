package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> catalyst Expression
  * converters, for wiring native expressions (graft.functions.*) into the
  * public Column API. Lives under org.apache.spark.sql solely for access;
  * contains no logic.
  */
package object graftnative {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The `private[sql]` option key + codec DataFrameWriter uses to
    * deliver `.partitionBy(...)` to a V1 CreatableRelationProvider
    * (saveToV1SourceCommand adds `PARTITIONING_COLUMNS_KEY ->
    * encodePartitioningColumns(cols)` before planForWriting) — how
    * `df.write.format("graft").partitionBy(...)` reaches TxLog.append.
    */
  def partitioningColumnsKey: String =
    execution.datasources.DataSourceUtils.PARTITIONING_COLUMNS_KEY

  def decodePartitioningColumns(json: String): Seq[String] =
    execution.datasources.DataSourceUtils.decodePartitioningColumns(json)

  /** `private[sql]` TypeCollection, for ExpectsInputTypes declarations
    * that accept one-of-several input types (e.g. pq_adc taking packed
    * `binary` codes or the SQL-surface `array<int>`).
    */
  def typeCollection(ts: types.AbstractDataType*): types.AbstractDataType =
    types.TypeCollection(ts: _*)

  /** The session's REGISTERED catalog plugin instance under `name`
    * (`spark.sql.catalog.<name>`), or None when no such catalog is
    * configured — how TxLogSql recognizes a catalog-qualified DML target
    * (`cat.db.t`) as a commit-log table without its own registry entry.
    * Goes through the CatalogManager (not a fresh instantiation) so the
    * plugin Spark's own analyzer uses — with its initialized warehouse —
    * is the one consulted.
    */
  def catalogPlugin(spark: SparkSession,
                    name: String): Option[connector.catalog.CatalogPlugin] =
    try Some(spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalogManager.catalog(name))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Parse SQL text with the session's own parser WITHOUT executing it —
    * the entry point for DML statements (MERGE INTO / DELETE FROM /
    * UPDATE) that Spark's grammar accepts but only DSv2 tables execute;
    * graft.lake.TxLogSql pattern-matches the parsed plan and dispatches
    * to the commit-log implementations instead.
    */
  def parsePlan(spark: SparkSession, sqlText: String): catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(sqlText)

  /** Parse one SQL expression without resolving it — how TxLog validates
    * a CHECK constraint's text and extracts its column references at
    * ALTER time (failing there, not at the next write).
    */
  def parseExpression(spark: SparkSession, sqlText: String): Expression =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser
      .parseExpression(sqlText)

  /** Analyze + wrap a logical plan as a DataFrame (the `private[sql]`
    * Dataset.ofRows) — how TxLogSql turns a parsed MERGE source relation
    * into the updates frame.
    */
  def planToDf(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Register a function into an ALREADY-RUNNING session's registry —
    * the runtime counterpart of `spark.sql.extensions` for sessions the
    * caller didn't build (notebooks, shells, tests).
    */
  def registerFunction(
      spark: SparkSession,
      name: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(name, info, builder)

  /** A NEW session over the same SparkContext with extensions applied —
    * what tests and shells need to exercise ANALYZER-rule injections:
    * runtime registration can add functions and planner strategies, but
    * a session's extendedResolutionRules are fixed at build time, so
    * rules like the readStream-catalog bridge need a session built with
    * `spark.sql.extensions` (clusters) or this (an existing JVM).
    * Implemented through the public builder — the default/active session
    * is cleared for the construction (getOrCreate would otherwise hand
    * back the existing session, extensions silently dropped) and
    * restored after. The clear-build-restore window mutates JVM-GLOBAL
    * session state, so the whole sequence serializes on a monitor:
    * concurrent CALLERS OF THIS HELPER can never interleave their
    * clears/restores. A thread running a bare
    * `SparkSession.builder().getOrCreate()` concurrently is still
    * outside the monitor's reach (it doesn't take it) — that is
    * inherent to the global-registry design, which is why this helper
    * is for TEST/SHELL wiring, not hot paths: production clusters set
    * `spark.sql.extensions` at session build and never need it.
    */
  def sessionWithExtensions(spark: SparkSession,
                            f: SparkSessionExtensions => Unit): SparkSession =
    sessionSwapLock.synchronized {
      val prevDefault = SparkSession.getDefaultSession
      val prevActive = SparkSession.getActiveSession
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      try SparkSession.builder().withExtensions(f).getOrCreate()
      finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    }

  private object sessionSwapLock

  /** The V1 streaming leaf for a `format` source with `options` — what
    * the analyzer bridge substitutes for a StreamingRelationV2 over a
    * graft catalog table (the table exposes no DSv2 MicroBatchStream;
    * its streaming read IS the V1 change-feed source behind
    * `readStream.format("graft")`). Both types are `private[sql]`.
    */
  def v1StreamingRelation(spark: SparkSession, format: String,
                          options: Map[String, String])
      : catalyst.plans.logical.LogicalPlan =
    execution.streaming.runtime.StreamingRelation(
      execution.datasources.DataSource(
        spark.asInstanceOf[classic.SparkSession],
        className = format, options = options))

  /** Re-plan a batch DataFrame as a STREAMING one (isStreaming=true) —
    * what a V1 `Source.getBatch` must return so MicroBatchExecution
    * accepts the micro-batch plan. Same trick every built-in V1 source
    * uses via the `private[sql]` internalCreateDataFrame; the RDD is the
    * batch plan's own lazily-materialized execution.
    */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse of [[asStreamingBatch]]: re-plan the micro-batch Dataset
    * a V1 `Sink.addBatch` receives (a streaming IncrementalExecution) as a
    * plain BATCH DataFrame, so normal writers can consume it — calling
    * `.write` on the streaming plan directly would throw "queries with
    * streaming sources must be executed with writeStream.start()".
    */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}

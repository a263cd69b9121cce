package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.current_timestamp

/** The staging -> curated promote pipeline (SURVEY.md §2A O-15/16/17/18,
  * EP-1/EP-3): scan staging JSON (all-string) -> normalize -> enrich ->
  * empty gate -> partitioned Parquet append -> catalog create/evolve/repair.
  *
  * In the reference this is two code paths (wrangler utils.py:147-172 for
  * small loads, a dispatched Glue job staging_to_curated.py:82-175 for big
  * ones); on Spark the same DataFrame pipeline IS both — scale comes from
  * the cluster, not from a dispatch hop.
  */
object Promote {

  final case class Result(table: String, curatedPath: String,
                          rows: Long, addedColumns: Seq[(String, String)],
                          version: Option[Long] = None,
                          dropped: Map[String, Long] = Map.empty)

  /** Run the promote for `table`. Returns None when staging is empty (the
    * count gate, staging_to_curated.py:97-101 — implemented with isEmpty,
    * which only materializes one partition's first row, not a full count).
    *
    * @param asOf        processing timestamp (defaults to wall clock; pin a
    *                    literal for deterministic tests)
    * @param register    when true, create/evolve/MSCK the catalog table
    * @param dropNa      the reference's flag-gated NA-column drop (off)
    * @param acid        when true, the curated write is a [[TxLog]] commit
    *                    (the reference's catalog_versioning=True realized:
    *                    each promote is one atomic version — concurrent
    *                    readers see the previous snapshot until the commit
    *                    lands, and every load is time-travelable /
    *                    rollback-able). Read the table back with
    *                    [[TxLog.readLatest]] instead of a path scan.
    * @param expectations data-quality gates ([[Expect]]) evaluated on the
    *                    NORMALIZED batch (all-string columns, sanitized
    *                    names): violating rows are dropped before enrich/
    *                    write, and per-expectation drop counts land in
    *                    `Result.dropped` — observed in the same pass as
    *                    the write, no extra scan (DLT-expectations shape).
    */
  def promote(spark: SparkSession, zones: Zones, table: String,
              asOf: Column = current_timestamp(),
              register: Boolean = false,
              dropNa: Boolean = false,
              acid: Boolean = false,
              expectations: Seq[Expect.Expectation] = Seq.empty): Option[Result] = {
    // a path-scanning catalog table over a TxLog root would read EVERY
    // version's files (logically-removed ones are kept for time travel),
    // silently diverging from the committed snapshot — reject the combo
    // instead of registering a wrong table
    require(!(acid && register),
      "acid promotes are read via TxLog.readLatest/readAt; a path-scan " +
        "catalog table over the commit-log root would see all versions")
    // Glue's groupFiles/groupSize file-grouping (staging_to_curated.py:
    // 90-91) is a SCAN-TIME setting, so it wraps the promote's consuming
    // actions (count gate, curated write): a staging prefix of thousands
    // of small gzip-JSON objects coalesces into ~100 MiB read splits
    // instead of one task per file, and the setting is restored after so
    // later queries on the session keep their own scan granularity.
    Writer.withGroupedScan(spark) {
      promoteInner(spark, zones, table, asOf, register, dropNa, acid,
        expectations)
    }
  }

  private def promoteInner(spark: SparkSession, zones: Zones, table: String,
                           asOf: Column, register: Boolean,
                           dropNa: Boolean, acid: Boolean,
                           expectations: Seq[Expect.Expectation]): Option[Result] = {
    // Count gate (staging_to_curated.py:97-101). An absent/empty staging
    // prefix makes the JSON reader throw (no schema to infer) — that is the
    // same "nothing to promote" outcome, not an error.
    val staged =
      try {
        val df = Writer.readStagingJson(spark, zones.stagingIncremental(table))
        if (df.schema.isEmpty || df.isEmpty) return None
        df
      } catch { case _: org.apache.spark.sql.AnalysisException => return None }

    val normalized0 = Normalize.normalize(staged, dropNa = dropNa)
    val (normalized, obsOpt) =
      if (expectations.isEmpty) (normalized0, None)
      else {
        val (kept, obs) = Expect.dropInvalid(normalized0, expectations)
        (kept, Some(obs))
      }
    // cache: the batch is both written and counted (Result.rows must be
    // THIS batch's size — a read-back count of the curated path would
    // report all historical partitions, and at scale would re-scan the
    // whole table on every incremental promote)
    val enriched = Enrich.withAuditColumns(normalized, asOf).cache()
    val curatedPath = zones.curated(table)
    var version: Option[Long] = None
    val batchRows =
      try {
        if (acid)
          version = Some(TxLog.append(spark, enriched, curatedPath,
            Enrich.PartitionColumns))
        else
          Writer.writeCurated(enriched, curatedPath, SaveMode.Append,
            Enrich.PartitionColumns)
        enriched.count()
      } finally enriched.unpersist()

    val added =
      if (register) {
        val dataCols = CatalogOps.dataColumns(enriched.schema, Enrich.PartitionColumns)
        val partCols = Enrich.PartitionColumns.map(_ -> "string")
        val created = CatalogOps.createParquetTableIfAbsent(
          spark, table, curatedPath, dataCols, partCols)
        val evolved =
          if (created) Seq.empty
          else CatalogOps.evolveSchema(spark, table, dataCols)
        CatalogOps.repairPartitions(spark, table)
        evolved
      } else Seq.empty

    // Partition values stay strings on read-back via Writer.readCurated
    // (scoped inference-off), not a session-wide conf mutation here.
    // The observation fired with the curated write (first action on the
    // cached batch), so reading it here never blocks.
    Some(Result(table, curatedPath, batchRows, added, version,
      obsOpt.map(Expect.violations).getOrElse(Map.empty)))
  }

  /** Ingest driver-side records (the REST/XML source boundary, O-2/O-12/
    * O-11): dump the verbatim payload to raw, stage the records as gzip
    * JSON. The vendor-API fetch itself is driver I/O outside the engine;
    * this is the `Seq[String] -> lake` seam it feeds.
    */
  def ingest(spark: SparkSession, zones: Zones, table: String,
             rawPayload: String, records: DataFrame,
             year: String, month: String): Unit = {
    Writer.writeRaw(spark, rawPayload, zones.raw(table, year, month))
    Writer.writeStagingJson(records, zones.stagingIncremental(table))
  }
}

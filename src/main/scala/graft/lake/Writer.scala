package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Zone sinks and sources (SURVEY.md §2A O-10/11/12/13/14/17/19).
  *
  * All writes are distributed `df.write` paths — executors write their own
  * partitions in parallel; nothing funnels through the driver.
  */
object Writer {

  /** Partitioned snappy-Parquet curated sink (reference utils.py:72-83
    * overwrite, utils.py:241-252 append, staging_to_curated.py:104-115).
    */
  def writeCurated(df: DataFrame, path: String, mode: SaveMode,
                   partitionCols: Seq[String] = Enrich.PartitionColumns): Unit =
    df.write.mode(mode)
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Gzip-JSON staging sink (utils.py:118-144): records as JSON lines,
    * gzip-compressed, appended.
    */
  def writeStagingJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("compression", "gzip")
      .json(path)

  /** Partition-level upsert: overwrite ONLY the partitions present in
    * `df`, leaving all other history untouched (dynamic partition
    * overwrite — the parquet-lake stand-in for MERGE when the grain is a
    * partition, e.g. a corrected daily reload). A static Overwrite would
    * truncate the whole table; Append would duplicate the reloaded rows.
    */
  def upsertPartitions(df: DataFrame, path: String,
                       partitionCols: Seq[String] = Enrich.PartitionColumns): Unit = {
    val prev = df.sparkSession.conf
      .get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try writeCurated(df, path, SaveMode.Overwrite, partitionCols)
    finally df.sparkSession.conf
      .set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  /** Small-file compaction of one Hive partition: incremental appends
    * leave one file per (load, task); over months a hot partition
    * accumulates thousands of small files and every scan pays per-file
    * open cost. Rewrite the partition's data into ~`targetFiles` files via
    * the same dynamic-overwrite path (repartition, not coalesce: coalesce
    * would narrow the READ parallelism of the rewrite itself).
    */
  def compactPartition(spark: SparkSession, path: String,
                       partitionValues: Seq[(String, String)],
                       targetFiles: Int = 1): Unit = {
    require(partitionValues.nonEmpty, "compaction targets a specific partition")
    val full = readCurated(spark, path)
    val part = partitionValues.foldLeft(full) { case (d, (k, v)) =>
      d.filter(org.apache.spark.sql.functions.col(k) === v)
    }
    upsertPartitions(part.repartition(targetFiles), path,
      partitionValues.map(_._1))
  }

  /** Read back a curated path with partition values kept as STRINGS
    * (SURVEY §1.3's all-string partition scheme). Partition-column types
    * resolve eagerly when the relation is created, so the inference
    * setting is scoped to this call and restored — a later unrelated
    * query in the same session must not silently inherit it.
    */
  def readCurated(spark: SparkSession, path: String): DataFrame = {
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try spark.read.parquet(path)
    finally spark.conf.set(key, prev)
  }

  /** Raw-zone verbatim payload dump (utils.py:210-220): the payload is
    * stored exactly as received, one gzip text object.
    */
  def writeRaw(spark: SparkSession, payload: String, path: String): Unit = {
    import spark.implicits._
    Seq(payload).toDF("value").write.mode(SaveMode.Append)
      .option("compression", "gzip").text(path)
  }

  /** Staging truncate (utils.py:108-115): recursive delete of the staging
    * prefix for `table` and its `_incremental` twin.
    */
  def truncateStaging(spark: SparkSession, zones: Zones, table: String): Unit =
    Seq(zones.staging(table), zones.stagingIncremental(table)).foreach { dir =>
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }

  /** Staging JSON scan with the reference's all-string model
    * (utils.py:156-160, `dtype=str`): primitives parse as strings; nested
    * objects stay structs for [[Normalize.flatten]] to unpack.
    * Parallelism is Spark-native (no use_threads knob needed).
    */
  def readStagingJson(spark: SparkSession, path: String): DataFrame =
    dropCorruptColumn(
      spark.read.option("primitivesAsString", "true").json(path))

  /** A malformed staged line makes Spark add the internal
    * `_corrupt_record` column to the inferred schema, and any query that
    * references only that column (e.g. the count gate) throws
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN. Drop it: the bad line still lands
    * as an all-null row (PERMISSIVE), which the all-string coercion maps
    * to empty strings — one garbled vendor line must not fail the batch.
    */
  private def dropCorruptColumn(df: DataFrame): DataFrame = {
    val corrupt = df.sparkSession.conf
      .get("spark.sql.columnNameOfCorruptRecord", "_corrupt_record")
    if (df.columns.contains(corrupt)) df.drop(corrupt) else df
  }

  /** Grouped-file JSON scan (staging_to_curated.py:85-95): recursive read;
    * the small-file coalescing half of Glue's groupFiles/groupSize comes
    * from [[withGroupedScan]] wrapped around the CONSUMING ACTION —
    * file-split sizing is a session conf read at action time, not a
    * reader option, so it cannot be baked into the returned (lazy) frame.
    */
  def readGroupedJson(spark: SparkSession, path: String): DataFrame =
    dropCorruptColumn(
      spark.read
        .option("recursiveFileLookup", "true")
        .option("primitivesAsString", "true")
        .json(path))

  /** Reentrancy state for [[withGroupedScan]]: per-session depth + the
    * value to restore when the LAST concurrent scope exits. A naive
    * save/set/restore races under Orchestrate's parallel promotes (thread
    * B can save thread A's temporary value as its "previous", permanently
    * leaking the grouping conf into the session).
    */
  private val groupScanLock = new Object
  private val groupScanState =
    scala.collection.mutable.Map.empty[SparkSession, (Int, String)]

  /** Run `body` with `spark.sql.files.maxPartitionBytes` set to
    * `groupBytes` (the Spark-native equivalent of Glue's
    * groupFiles/groupSize, staging_to_curated.py:90-91) and restore the
    * previous value after the last concurrent scope exits — one load's
    * scan granularity must not leak into every later query on the
    * session. Concurrent scopes on one session share the first entrant's
    * setting (the conf is session-global; all engine callers pass the
    * same 100 MiB default).
    */
  def withGroupedScan[T](spark: SparkSession,
                         groupBytes: Long = 104857600L)(body: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    groupScanLock.synchronized {
      val (depth, prev) = groupScanState.getOrElse(spark, (0, null: String))
      if (depth == 0) {
        groupScanState(spark) = (1, spark.conf.get(key))
        spark.conf.set(key, groupBytes.toString)
      } else groupScanState(spark) = (depth + 1, prev)
    }
    try body finally groupScanLock.synchronized {
      val (depth, prev) = groupScanState(spark)
      if (depth == 1) {
        spark.conf.set(key, prev)
        groupScanState.remove(spark)
      } else groupScanState(spark) = (depth - 1, prev)
    }
  }

  /** Schema extraction (staging_to_curated.py:61-70): name -> simple type
    * string for catalog ops.
    */
  def schemaMap(df: DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  /** Partition-column exclusion (staging_to_curated.py:73-79). */
  def excludePartitionColumns(schema: Map[String, String],
                              partitionCols: Seq[String]): Map[String, String] =
    schema -- partitionCols

  /** All-string schema for a known column list (the staging read contract
    * when the producer's schema is already known).
    */
  def allStringSchema(cols: Seq[String]): StructType =
    StructType(cols.map(StructField(_, StringType, nullable = true)))
}

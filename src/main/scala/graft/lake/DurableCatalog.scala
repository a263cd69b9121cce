package graft.lake

import org.apache.spark.sql.SparkSession

/** Warehouse-backed DURABLE catalog — the flag-gated twin of the default
  * in-memory session catalog.
  *
  * The reference's Glue Data Catalog persists across jobs: one run
  * creates a table (`staging_to_curated.py:122-134`) and any later
  * Athena/Glue session queries it (`utils.py:72-83` registers,
  * `purchase_orders.py:22-24` reads). The engine's `CatalogOps` DDL is
  * catalog-agnostic, but a default-built SparkSession lands it in the
  * in-memory catalog, which dies with the session. Building the session
  * through [[builder]] instead backs `spark.catalog` with a
  * Hive-metastore (embedded Derby) whose database and warehouse both
  * live at caller-chosen paths — shared storage in production — so
  * tables created in one session (or JVM) are visible to every later
  * one pointed at the same paths. That is the flag: nothing else in the
  * engine changes, every `CatalogOps`/`Promote` call works identically
  * against either catalog implementation.
  *
  * Cluster shape: on a real deployment the metastore URL points at a
  * shared RDBMS (or Glue itself) instead of embedded Derby — the single
  * `javax.jdo.option.ConnectionURL` config is the only seam. Embedded
  * Derby allows ONE live session at a time (file lock), which is the
  * standard local/test topology.
  */
object DurableCatalog {

  /** A session builder whose catalog is durable at (warehouseDir,
    * metastoreDb). Callers add master/app config and `getOrCreate()`.
    * NOTE: `getOrCreate` reuses a live session when one exists — for a
    * catalog-isolated session the caller needs a fresh JVM (what the
    * cross-session spec does) or `SparkSession.clearActiveSession` +
    * a stopped context.
    */
  def builder(warehouseDir: String, metastoreDb: String): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.warehouse.dir", warehouseDir)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastoreDb;create=true")
      .enableHiveSupport()
}

/** Subprocess driver for the cross-session durability proof: phase
  * `create` registers a partitioned parquet table through the normal
  * `CatalogOps` path and exits; phase `read` starts a FRESH JVM/session
  * on the same metastore and must see and scan it. Run by
  * `DurableCatalogSpec` — two separate JVMs, which is the only honest
  * "another session" on a local box (in-JVM sessions share a
  * SparkContext and its SharedState catalog).
  */
object DurableCatalogMain {
  def main(args: Array[String]): Unit = {
    if (args.length != 4 ||
        !Set("create", "read").contains(args(0)))
      throw new IllegalArgumentException(
        "usage: DurableCatalogMain <create|read> <warehouseDir> " +
          s"<metastoreDb> <dataDir> — got: ${args.mkString(" ")}")
    val Array(phase, warehouseDir, metastoreDb, dataDir) = args
    val spark = DurableCatalog.builder(warehouseDir, metastoreDb)
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try phase match {
      case "create" =>
        import spark.implicits._
        val df = Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"))
          .toDF("id", "s", "part")
        df.write.mode("overwrite").partitionBy("part").parquet(dataDir)
        CatalogOps.createParquetTableIfAbsent(
          spark, "durable_demo", dataDir,
          dataColumns = Seq("id" -> "bigint", "s" -> "string"),
          partitionColumns = Seq("part" -> "string"))
        CatalogOps.repairPartitions(spark, "durable_demo")
        println(s"CREATE_OK rows=${spark.table("durable_demo").count()}")
      case "read" =>
        // a fresh JVM: the ONLY state shared with the create phase is the
        // metastore db + files on disk
        val n = spark.sql(
          "SELECT COUNT(*) FROM durable_demo WHERE part = 'p1'").head().getLong(0)
        val total = spark.table("durable_demo").count()
        println(s"READ_OK p1=$n total=$total")
    } finally spark.stop()
  }
}

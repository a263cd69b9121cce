package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scan budget = Athena BytesScannedCutoffPerQuery analog: planned bytes
  * are measured post-partition-pruning, and an over-budget query fails
  * before any IO.
  */
class ScanBudgetSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("scan_budget").toString
    import spark.implicits._
    // partition p=0 carries ~10x the bytes of p=1, so pruning to p=1 must
    // show up as a large planned-bytes drop
    (1 to 5000).map(i => (i, i % 10, "x" * 50)).toDF("id", "v", "pad")
      .withColumn("p", lit(0))
      .union(Seq((1, 1, "y")).toDF("id", "v", "pad").withColumn("p", lit(1)))
      .write.partitionBy("p").mode("overwrite").parquet(d)
    d
  }

  test("plannedScanBytes credits partition pruning") {
    val full = ScanBudget.plannedScanBytes(spark.read.parquet(dir))
    val pruned =
      ScanBudget.plannedScanBytes(spark.read.parquet(dir).filter(col("p") === 1))
    full should be > 0L
    pruned should be > 0L
    // the small partition is a tiny fraction of the table
    pruned.toDouble / full should be < 0.5
  }

  test("plannedScanBytes charges commit-log (graft) scans and credits file skipping") {
    // four single-file stats-bearing commits with disjoint id ranges —
    // the scan plans as RowDataSourceScanExec over the V1 fallback, so
    // the accounting must come from the relation's own seam, not
    // selectedPartitions (which the opaque RDD doesn't have)
    val root = Files.createTempDirectory("scan_budget_graft").toString
    import spark.implicits._
    (0 until 4).foreach { c =>
      graft.lake.TxLog.append(spark,
        (0 until 200).map(i => (c * 200L + i, "x" * 30)).toDF("id", "s")
          .repartition(1), root, statsCols = Seq("id"))
    }
    val sizes = graft.lake.TxLog.liveSizes(spark, root).map(_._2)
    val full = ScanBudget.plannedScanBytes(
      spark.read.format("graft").load(root))
    full shouldBe sizes.sum
    // a stats-pruned point-range read is charged ONE file, not four
    val pruned = ScanBudget.plannedScanBytes(
      spark.read.format("graft").load(root)
        .filter(col("id") >= 210L && col("id") < 220L))
    pruned should be < full
    sizes should contain(pruned) // exactly one file's bytes
    // and enforcement binds the same number
    try {
      spark.conf.set(ScanBudget.ConfKey, (pruned - 1).toString)
      intercept[ScanBudget.ScanBudgetExceededException] {
        ScanBudget.check(spark.read.format("graft").load(root)
          .filter(col("id") >= 210L && col("id") < 220L))
      }
    } finally spark.conf.unset(ScanBudget.ConfKey)
  }

  test("check passes under budget, throws over budget, no-ops unset") {
    val df = spark.read.parquet(dir).filter(col("p") === 1)
    val planned = ScanBudget.plannedScanBytes(df)
    try {
      spark.conf.set(ScanBudget.ConfKey, (planned + 1000).toString)
      ScanBudget.check(df) shouldBe planned
      spark.conf.set(ScanBudget.ConfKey, (planned - 1).toString)
      val e = intercept[ScanBudget.ScanBudgetExceededException] {
        ScanBudget.check(df)
      }
      e.plannedBytes shouldBe planned
      e.budgetBytes shouldBe (planned - 1)
    } finally spark.conf.unset(ScanBudget.ConfKey)
    // unset = uncapped
    ScanBudget.check(spark.read.parquet(dir)) should be > 0L
  }

  test("extension-injected rule enforces the budget on adaptive queries") {
    // a SEPARATE session (same context) built with the extensions, so the
    // stage-prep rule is actually installed — the cluster deployment shape
    // (spark.sql.extensions=graft.plans.GraftExtensions)
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .create()
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set(ScanBudget.ConfKey, "10")
      val err = intercept[Throwable] {
        s.read.parquet(dir).agg(sum("id")).collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      chain(err).exists(
        _.isInstanceOf[ScanBudget.ScanBudgetExceededException]) shouldBe true

      // under budget the same query runs
      s.conf.set(ScanBudget.ConfKey, (1L << 40).toString)
      s.read.parquet(dir).agg(sum("id")).collect().head.getLong(0) should be > 0L

      // pruning buys headroom: cap between the pruned and unpruned sizes
      val full = ScanBudget.plannedScanBytes(s.read.parquet(dir))
      val pruned =
        ScanBudget.plannedScanBytes(s.read.parquet(dir).filter(col("p") === 1))
      s.conf.set(ScanBudget.ConfKey, ((pruned + full) / 2).toString)
      s.read.parquet(dir).filter(col("p") === 1).count() shouldBe 1L
      intercept[Throwable] { s.read.parquet(dir).count() }
    } finally {
      s.conf.unset(ScanBudget.ConfKey)
      // do NOT s.stop(): the SparkContext is shared with every other suite
    }
  }
}

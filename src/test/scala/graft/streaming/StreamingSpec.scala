package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.lake.{Writer, Zones}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming surface: file-stream promote (AvailableNow),
  * watermarked windowed aggregation, and stateful sessionization.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming promote drains staged JSON into curated partitioned parquet") {
    val zones = Zones(Files.createTempDirectory("graft-stream").toString)
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val table = "po_stream"
    Seq("""{"po":"P-1","amount":"10"}""", """{"po":"P-2","amount":"20"}""")
      .toDF("value").write.mode("append")
      .text(zones.stagingIncremental(table))

    val q = StreamingPromote.run(spark, zones, table,
      Writer.allStringSchema(Seq("po", "amount")), checkpoint)
    q.awaitTermination(60000)

    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    val back = spark.read.parquet(zones.curated(table))
    back.count() shouldBe 2L
    back.columns.sorted.toSeq shouldBe
      Seq("amount", "po", "processed_at", "processed_month", "processed_year")

    // second micro-load: only NEW files are processed (checkpointed offsets)
    Seq("""{"po":"P-3","amount":"30"}""").toDF("value").write.mode("append")
      .text(zones.stagingIncremental(table))
    val q2 = StreamingPromote.run(spark, zones, table,
      Writer.allStringSchema(Seq("po", "amount")), checkpoint)
    q2.awaitTermination(60000)
    spark.read.parquet(zones.curated(table)).count() shouldBe 3L
  }

  test("streaming ACID promote: each drained run commits one TxLog version; versions time-travel") {
    import graft.lake.TxLog
    val zones = Zones(Files.createTempDirectory("graft-stream-acid").toString)
    val checkpoint = Files.createTempDirectory("graft-ckpt-acid").toString
    val table = "po_acid"
    val schema = Writer.allStringSchema(Seq("po", "amount"))
    Seq("""{"po":"P-1","amount":"10"}""", """{"po":"P-2","amount":"20"}""")
      .toDF("value").write.mode("append")
      .text(zones.stagingIncremental(table))

    StreamingPromote.runAcid(spark, zones, table, schema, checkpoint)
      .awaitTermination(60000)
    val curated = zones.curated(table)
    TxLog.latestVersion(spark, curated) shouldBe Some(0L)
    TxLog.readLatest(spark, curated).count() shouldBe 2L

    // second drain picks up only the new file and commits version 1
    Seq("""{"po":"P-3","amount":"30"}""").toDF("value").write.mode("append")
      .text(zones.stagingIncremental(table))
    StreamingPromote.runAcid(spark, zones, table, schema, checkpoint)
      .awaitTermination(60000)
    TxLog.latestVersion(spark, curated) shouldBe Some(1L)
    TxLog.readLatest(spark, curated).count() shouldBe 3L
    // the first micro-batch is a time-travelable snapshot
    TxLog.readAt(spark, curated, 0L).count() shouldBe 2L
    // an empty drain commits nothing
    StreamingPromote.runAcid(spark, zones, table, schema, checkpoint)
      .awaitTermination(60000)
    TxLog.latestVersion(spark, curated) shouldBe Some(1L)
  }

  test("change-feed stream: commits arrive as tagged micro-batches; restart resumes at the checkpoint") {
    import graft.lake.TxLog
    val root = Files.createTempDirectory("graft-cdc").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-ckpt").toString
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "s"), root)            // v0
    TxLog.append(spark, Seq((2L, "b")).toDF("id", "s"), root)            // v1

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    def drain(): Unit = {
      val q = spark.readStream
        .format("graft.streaming.TxLogChangeSourceProvider")
        .option("root", root)
        .load()
        .writeStream
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= df.select("_commit_version", "_change_type", "id")
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
          ()
        }
        .start()
      q.awaitTermination(60000)
    }
    drain()
    got.toSet shouldBe Set((0L, "insert", 1L), (1L, "insert", 2L))

    // restart after new commits: ONLY the delta arrives, deletes included
    got.clear()
    TxLog.overwrite(spark, Seq((3L, "c")).toDF("id", "s"), root)         // v2
    drain()
    got.toSet shouldBe Set(
      (2L, "delete", 1L), (2L, "delete", 2L), (2L, "insert", 3L))

    // nothing new -> an empty drain emits nothing
    got.clear()
    drain()
    got shouldBe empty

    // a nightly OPTIMIZE relayout mid-stream: the offsets ADVANCE past
    // it but NO rows arrive (un-skipped, every surviving row would
    // re-emit as delete+insert and the downstream would reprocess the
    // whole table); a real change after it still flows
    got.clear()
    TxLog.append(spark, Seq((4L, "d")).toDF("id", "s"), root)            // v3
    TxLog.compact(spark, root, smallerThanBytes = 1L << 30)              // v4
    TxLog.append(spark, Seq((5L, "e")).toDF("id", "s"), root)            // v5
    drain()
    got.toSet shouldBe Set((3L, "insert", 4L), (5L, "insert", 5L))
  }

  test("CdcApply replicates a table through its change feed; restart applies only the delta") {
    import graft.lake.TxLog
    val src = Files.createTempDirectory("graft-cdcapply-src").toString
    val dst = Files.createTempDirectory("graft-cdcapply-dst").toString
    val ckpt = Files.createTempDirectory("graft-cdcapply-ckpt").toString
    def sorted(root: String): Seq[(Long, String)] =
      TxLog.readLatest(spark, root).select("id", "s")
        .as[(Long, String)].collect().sortBy(_._1).toSeq

    TxLog.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), src)   // v0
    CdcApply.start(spark, src, dst, keyCols = Seq("id"),
      checkpointDir = ckpt).awaitTermination(120000)
    sorted(dst) shouldBe Seq((1L, "a"), (2L, "b"), (3L, "c"))

    // upstream evolves: one row updated (merge), one deleted
    TxLog.merge(spark, Seq((2L, "B!")).toDF("id", "s"), src,
      keyCols = Seq("id"), partitionCols = Seq.empty)              // v1
    TxLog.delete(spark, src, col("id") === 3L)                     // v2
    val dstVersionBefore = TxLog.latestVersion(spark, dst).get
    CdcApply.start(spark, src, dst, keyCols = Seq("id"),
      checkpointDir = ckpt).awaitTermination(120000)
    sorted(dst) shouldBe Seq((1L, "a"), (2L, "B!"))
    // the catch-up applied the delta as ONE downstream commit, not a
    // re-load (the change feed carried v1+v2 in a single trigger)
    TxLog.latestVersion(spark, dst).get shouldBe dstVersionBefore + 1

    // nothing new upstream: the drain is a downstream no-op
    CdcApply.start(spark, src, dst, keyCols = Seq("id"),
      checkpointDir = ckpt).awaitTermination(120000)
    sorted(dst) shouldBe Seq((1L, "a"), (2L, "B!"))
  }

  test("replicateOnce drives batch replication through a durable offset") {
    import graft.lake.TxLog
    val src = Files.createTempDirectory("graft-rep1-src").toString
    val dst = Files.createTempDirectory("graft-rep1-dst").toString
    val off = Files.createTempDirectory("graft-rep1-off").toString + "/offset"

    TxLog.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "s"), src)
    CdcApply.replicateOnce(spark, src, dst, Seq("id"), off) shouldBe
      Some((-1L, 0L))
    TxLog.readLatest(spark, dst).count() shouldBe 2L

    // caught up: no-op, offset untouched
    CdcApply.replicateOnce(spark, src, dst, Seq("id"), off) shouldBe None

    // delta: an update lands downstream without a re-load
    TxLog.merge(spark, Seq((2L, "B!")).toDF("id", "s"), src,
      keyCols = Seq("id"), partitionCols = Seq.empty)
    CdcApply.replicateOnce(spark, src, dst, Seq("id"), off) shouldBe
      Some((0L, 1L))
    TxLog.readLatest(spark, dst).orderBy("id").as[(Long, String)]
      .collect().toSeq shouldBe Seq((1L, "a"), (2L, "B!"))
  }

  test("change-feed stream startingTimestamp includes exactly the commits at-or-after the instant") {
    import graft.lake.TxLog
    val root = Files.createTempDirectory("graft-cdc-ts").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-ts-ckpt").toString
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "s"), root)            // v0
    Thread.sleep(20)
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    TxLog.append(spark, Seq((2L, "b")).toDF("id", "s"), root)            // v1
    TxLog.append(spark, Seq((3L, "c")).toDF("id", "s"), root)            // v2
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .format("graft.streaming.TxLogChangeSourceProvider")
      .option("root", root)
      .option("startingTimestamp", between.toString)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.select("_commit_version").collect().map(_.getLong(0))
        ()
      }
      .start()
    q.awaitTermination(60000)
    got.toSet shouldBe Set(1L, 2L) // v0 predates the instant
    // both options together are refused (provider-level: createSource is
    // lazy under readStream, so exercise it directly)
    intercept[IllegalArgumentException] {
      new TxLogChangeSourceProvider().createSource(spark.sqlContext,
        Files.createTempDirectory("graft-cdc-ts-meta").toString, None, "p",
        Map("root" -> root, "startingVersion" -> "0",
          "startingTimestamp" -> between.toString))
    }.getMessage should include("not both")
  }

  test("change-feed stream backpressure: maxVersionsPerTrigger bounds each batch, AvailableNow still drains to the head") {
    import graft.lake.TxLog
    val root = Files.createTempDirectory("graft-cdc-bp").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-bp-ckpt").toString
    (0L until 4L).foreach(i =>
      TxLog.append(spark, Seq((i, s"r$i")).toDF("id", "s"), root))       // v0..v3

    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream
      .format("graft.streaming.TxLogChangeSourceProvider")
      .option("root", root)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = df.select("_commit_version").collect().map(_.getLong(0)).toSet
        if (vs.nonEmpty) batches += vs
        ()
      }
      .start()
    q.awaitTermination(120000)
    // one commit per micro-batch, and the whole head drained in one run
    batches.size shouldBe 4
    all(batches.map(_.size)) shouldBe 1
    batches.flatten.toSet shouldBe Set(0L, 1L, 2L, 3L)
  }

  test("change-feed stream catches up through a schema evolution (pre-evolution batches null-fill)") {
    import graft.lake.TxLog
    val root = Files.createTempDirectory("graft-cdc-evo").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-evo-ckpt").toString
    TxLog.append(spark, Seq((1L, "a")).toDF("id", "s"), root)            // v0
    TxLog.append(spark, Seq((2L, "b", 9L)).toDF("id", "s", "extra"), root) // v1: evolves
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    // cap=1 forces a batch covering ONLY pre-evolution v0, whose feed
    // schema lacks `extra`: the stream's pinned schema must null-fill it
    val q = spark.readStream
      .format("graft.streaming.TxLogChangeSourceProvider")
      .option("root", root)
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.select("id", "extra").collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.toSet shouldBe Set((1L, None), (2L, Some(9L)))
  }

  test("change-feed stream delivers deletion-vector deletes as delete rows") {
    import graft.lake.TxLog
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-cdc-dv").toString
    val checkpoint = Files.createTempDirectory("graft-cdc-dv-ckpt").toString
    TxLog.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), root)  // v0
    TxLog.deleteVectored(spark, root, col("id") === 2)             // v1
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = spark.readStream
      .format("graft.streaming.TxLogChangeSourceProvider")
      .option("root", root)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.select("id", "_change_type", "_commit_version").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }
      .start()
    q.awaitTermination(120000)
    got.filter(_._3 == 1L).toSeq shouldBe Seq((2L, "delete", 1L))
    got.filter(_._3 == 0L).map(_._1).sorted shouldBe Seq(1L, 2L, 3L)
  }

  test("txlog sink refuses to start without a dedup identity") {
    intercept[IllegalArgumentException] {
      new TxLogSinkProvider().createSink(spark.sqlContext,
        Map("root" -> "/tmp/whatever"), Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("txlog sink: one commit per micro-batch; a replayed batch id is skipped (exactly-once)") {
    import graft.lake.TxLog
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-sink").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "s").writeStream
      .format("graft.streaming.TxLogSinkProvider")
      .option("root", root)
      .option("checkpointLocation", ckpt)
      .start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    mem.addData((3L, "c"))
    q.processAllAvailable()
    q.stop()
    TxLog.latestVersion(spark, root) shouldBe Some(1L)
    TxLog.readLatest(spark, root).count() shouldBe 3L
    // each micro-batch is a time-travelable version
    TxLog.readAt(spark, root, 0L).count() shouldBe 2L

    // crash-replay simulation: a fresh sink instance (same appId = same
    // checkpoint) re-delivers batch 1 — the table watermark skips it
    val sink = new TxLogSinkProvider().createSink(spark.sqlContext,
      Map("root" -> root, "checkpointLocation" -> ckpt),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "s"))
    TxLog.latestVersion(spark, root) shouldBe Some(1L)
    TxLog.readLatest(spark, root).count() shouldBe 3L
    // a genuinely new batch id commits
    sink.addBatch(2L, Seq((4L, "d")).toDF("id", "s"))
    TxLog.latestVersion(spark, root) shouldBe Some(2L)
    TxLog.readLatest(spark, root).count() shouldBe 4L
  }

  test("windowed counts with watermark aggregate per 5-minute window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val out = StreamingPromote.windowedCounts(events)
    val q = out.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()

    mem.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.0),
      (ts("2024-01-01 00:02:00"), "click", 2.0),
      (ts("2024-01-01 00:03:00"), "view", 5.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the first window
    mem.addData((ts("2024-01-01 01:00:00"), "click", 9.0))
    q.processAllAvailable()

    val rows = spark.table("win_counts")
      .orderBy("window_start", "event_type")
      .select("event_type", "n", "sum_value").collect()
    q.stop()
    rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq shouldBe
      Seq(("click", 2L, 3.0), ("view", 1L, 5.0))
  }

  test("stream-stream interval join matches clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val out = StreamJoin.intervalJoin(
      purchases.toDF().toDF("p_ts", "p_user", "p_id"),
      clicks.toDF().toDF("c_ts", "c_user", "c_id"),
      leftKey = "p_user", rightKey = "c_user",
      leftTime = "p_ts", rightTime = "c_ts",
      watermark = "10 minutes", windowSpec = "30 minutes")
    val q = out.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()

    clicks.addData(
      (ts("2024-01-01 00:00:00"), 1L, 100L),   // in window for p 00:20
      (ts("2024-01-01 00:19:00"), 1L, 101L),   // in window
      (ts("2024-01-01 00:01:00"), 2L, 102L))   // other user
    purchases.addData((ts("2024-01-01 00:20:00"), 1L, 900L))
    q.processAllAvailable()
    // advance both watermarks so results flush
    clicks.addData((ts("2024-01-01 02:00:00"), 9L, 999L))
    purchases.addData((ts("2024-01-01 02:00:00"), 9L, 998L))
    q.processAllAvailable()

    val rows = spark.table("sj_out")
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    rows should contain allOf ((900L, 100L), (900L, 101L))
    rows should not contain ((900L, 102L))
  }

  test("streaming dedup drops in-watermark duplicates with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingDedup.dedup(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes",
      Seq("doc_id"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    mem.addData(
      (ts("2024-01-01 00:01:00"), 1L, "a"),
      (ts("2024-01-01 00:02:00"), 1L, "a dup"),   // dup within watermark
      (ts("2024-01-01 00:03:00"), 2L, "b"))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 00:04:00"), 2L, "b dup"))
    q.processAllAvailable()
    val emitted = spark.table("dedup_out").select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    q.stop()
    emitted shouldBe Seq(1L, 2L)
  }

  test("sessionization splits on gap and emits after watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val out = Sessionize.sessions(mem.toDS(),
      gapMs = 10 * 60 * 1000L, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // one user, two bursts 30 min apart -> two sessions
    mem.addData(
      Sessionize.Event(1L, ts("2024-01-01 00:00:00"), "click", 1.0),
      Sessionize.Event(1L, ts("2024-01-01 00:05:00"), "click", 2.0),
      Sessionize.Event(1L, ts("2024-01-01 00:35:00"), "view", 3.0))
    q.processAllAvailable()
    // push the watermark beyond the second session's gap
    mem.addData(Sessionize.Event(2L, ts("2024-01-01 02:00:00"), "click", 0.5))
    q.processAllAvailable()
    mem.addData(Sessionize.Event(2L, ts("2024-01-01 04:00:00"), "click", 0.5))
    q.processAllAvailable()

    val rows = spark.table("sessions")
      .filter(col("user_id") === 1L)
      .orderBy("session_start")
      .collect()
    q.stop()
    rows.length shouldBe 2
    rows(0).getAs[Long]("n_events") shouldBe 2L
    rows(0).getAs[Double]("total_value") shouldBe 3.0
    rows(1).getAs[Long]("n_events") shouldBe 1L
    rows(1).getAs[Timestamp]("session_start") shouldBe ts("2024-01-01 00:35:00")
  }
}

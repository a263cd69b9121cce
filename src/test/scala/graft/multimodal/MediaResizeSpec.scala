package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Media.MediaRecord

/** Resize + frame-sample stubs: deterministic, size-bounded, distributed. */
class MediaResizeSpec extends SparkSpec {

  import spark.implicits._

  test("resizeStub bounds output size and is deterministic") {
    val payload = Array.tabulate(1000)(i => (i % 251).toByte)
    val small = Media.resizeStub(payload, 100)
    small.length should be <= 100
    small.toSeq shouldBe Media.resizeStub(payload, 100).toSeq
    // already-small payloads pass through untouched
    Media.resizeStub(payload, 2000) shouldBe payload
  }

  test("frameSampleStub splits payload into n contiguous frames") {
    val payload = Array.tabulate(100)(_.toByte)
    val frames = Media.frameSampleStub(payload, 4)
    frames.length shouldBe 4
    frames.map(_.length).sum shouldBe 100
    frames.head.toSeq shouldBe (0 until 25).map(_.toByte)
    Media.frameSampleStub(Array.emptyByteArray, 4) shouldBe empty
  }

  test("resizeAll runs distributed and preserves ids") {
    val mk = (i: java.lang.Long) =>
      MediaRecord(i, Array.tabulate(500)(b => (b + i.toInt).toByte), "img")
    val ds = spark.range(200).map(mk).repartition(5)
    val out = Media.resizeAll(ds, targetBytes = 50).collect()
    out.length shouldBe 200
    out.foreach(_.payload.length should be <= 50)
    out.map(_.id).sorted.toSeq shouldBe (0L until 200L)
  }
}

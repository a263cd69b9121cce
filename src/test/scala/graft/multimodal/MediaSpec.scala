package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Media.{MediaFeatures, MediaRecord}

/** The multimodal decode seam: deterministic stub, batch shape, and
  * distributed execution without shuffle.
  */
class MediaSpec extends SparkSpec {

  import spark.implicits._

  private def rec(id: Long, bytes: Array[Byte]) = MediaRecord(id, bytes, "txt")

  test("decodeStub is deterministic and computes checksum + 4-bin histogram") {
    val r = rec(7L, Array[Byte](0, 65, -1, 120)) // unsigned: 0, 65, 255, 120
    val Seq(f) = Media.decodeStub(Seq(r))
    f.id shouldBe 7L
    f.nBytes shouldBe 4L
    f.checksum shouldBe (0 + 65 + 255 + 120)
    f.histogram4.toSeq shouldBe Seq(1.0, 2.0, 0.0, 1.0) // bins 0-63,64-127,128-191,192-255
    val Seq(f2) = Media.decodeStub(Seq(r))
    (f2.id, f2.nBytes, f2.checksum, f2.histogram4.toSeq) shouldBe
      (f.id, f.nBytes, f.checksum, f.histogram4.toSeq)
  }

  test("extractFeatures processes every record across partitions in batches") {
    val n = 500
    // self-contained lambda: must not capture the (non-serializable) spec
    val mk = (i: java.lang.Long) =>
      MediaRecord(i, s"payload-$i".getBytes("UTF-8"), "txt")
    val ds = spark.range(n).map(mk).repartition(7)
    val out = Media.extractFeatures(ds, batchSize = 32).collect()
    out.length shouldBe n
    out.map(_.id).sorted.toSeq shouldBe (0L until n.toLong)
    // spot-check against a driver-side run of the same stub
    val expected = Media.decodeStub(Seq(rec(3L, "payload-3".getBytes("UTF-8")))).head
    val got = out.find(_.id == 3L).get
    got.checksum shouldBe expected.checksum
    got.histogram4.toSeq shouldBe expected.histogram4.toSeq
  }

  test("withPayload attaches binary payload + metadata struct") {
    val df = Seq((1L, "hello")).toDF("doc_id", "text")
    val out = Media.withPayload(df)
    out.schema("payload").dataType.typeName shouldBe "binary"
    val r = out.selectExpr("meta.format", "meta.nBytes", "payload").head()
    r.getString(0) shouldBe "txt"
    r.getLong(1) shouldBe 5L
    new String(r.getAs[Array[Byte]](2), "UTF-8") shouldBe "hello"
  }
}

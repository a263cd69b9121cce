package graft.lake

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Unit + property tests for the normalize pipeline (SURVEY.md §2A O-5..O-9;
  * reference semantics utils.py:49,68-69,192-206).
  * Property loops sample scalacheck Gens directly (scalatestplus bridge is
  * not in the offline dependency cache).
  */
class NormalizeSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int = 50): Seq[A] =
    (0 until n).flatMap(i => gen(Gen.Parameters.default, Seed(i.toLong)))

  import spark.implicits._

  // --- flatten (O-5) ----------------------------------------------------

  test("flatten: nested structs become parent_child columns; arrays stay serialized JSON") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", StructType(Seq(
        StructField("b", StringType),
        StructField("c", StructType(Seq(StructField("d", IntegerType))))))),
      StructField("tags", ArrayType(StringType)),
      StructField("items", ArrayType(StructType(Seq(StructField("x", IntegerType)))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Row("hi", Row(7)), Seq("t1", "t2"), Seq(Row(1), Row(2)))),
      schema)
    val flat = Normalize.flatten(df)
    flat.columns.toSeq shouldBe Seq("id", "a_b", "a_c_d", "tags", "items")
    val r = flat.head()
    r.getAs[Long]("id") shouldBe 1L
    r.getAs[String]("a_b") shouldBe "hi"
    r.getAs[Int]("a_c_d") shouldBe 7
    // arrays-of-dicts are NOT exploded (utils.py:49): serialized JSON string
    r.getAs[String]("tags") shouldBe """["t1","t2"]"""
    r.getAs[String]("items") shouldBe """[{"x":1},{"x":2}]"""
  }

  test("flatten on a flat frame is identity (column set and values)") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val flat = Normalize.flatten(df)
    flat.columns.toSeq shouldBe Seq("k", "v")
    flat.collect() shouldBe df.collect()
  }

  // --- sanitize (O-6) ---------------------------------------------------

  test("sanitizeName: lowercase snake_case, illegal runs collapse to one _") {
    Normalize.sanitizeName("Po Number") shouldBe "po_number"
    Normalize.sanitizeName("a.b-c/d") shouldBe "a_b_c_d"
    Normalize.sanitizeName("already_ok_9") shouldBe "already_ok_9"
    Normalize.sanitizeName("Weird!!Name??") shouldBe "weird_name_"
  }

  test("sanitizeName is idempotent (property)") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = Normalize.sanitizeName(s)
      Normalize.sanitizeName(once) shouldBe once
    }
  }

  // --- drop duplicated columns (O-7) ------------------------------------

  test("dropDuplicatedColumns keeps the first of colliding names") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1, 2, 3)),
      StructType(Seq(
        StructField("x", IntegerType),
        StructField("x", IntegerType),
        StructField("y", IntegerType))))
    val out = Normalize.dropDuplicatedColumns(df)
    out.columns.toSeq shouldBe Seq("x", "y")
    out.head() shouldBe Row(1, 3)
  }

  // --- coerce to string (O-8) -------------------------------------------

  test("coerceToString: nulls and 'nan'/'None' artifacts become empty string; cells truncated") {
    val df = Seq(
      (Some(1), Some("nan"), Some("x" * 20000)),
      (None, Some("None"), Some("ok")),
      (Some(3), None, None)).toDF("a", "b", "c")
    val out = Normalize.coerceToString(df)
    out.schema.fields.forall(_.dataType == StringType) shouldBe true
    val rows = out.collect()
    rows(0).getString(1) shouldBe ""         // "nan" -> ""
    rows(1).getString(1) shouldBe ""         // "None" -> ""
    rows(1).getString(0) shouldBe ""         // null -> ""
    rows(0).getString(2).length shouldBe Normalize.MaxCellChars
    rows(2).getString(2) shouldBe ""
  }

  test("coerceToString invariants: no nulls, no cell beyond cap (property)") {
    val vals = samples(Gen.option(Gen.asciiPrintableStr), 60)
    val df = vals.map(v => Tuple1(v.orNull)).toDF("v")
    val out = Normalize.coerceToString(df, maxLen = 10)
    val col = out.collect().map(_.getString(0))
    col.forall(_ != null) shouldBe true
    col.forall(_.length <= 10) shouldBe true
  }

  // --- NA-column drop (O-9, flag-gated) ---------------------------------

  test("dropNaColumns: off by default; drops columns containing any null when enabled") {
    val df = Seq((Some(1), Some("a")), (None, Some("b"))).toDF("has_null", "clean")
    Normalize.dropNaColumns(df).columns.toSeq shouldBe Seq("has_null", "clean")
    Normalize.dropNaColumns(df, enabled = true).columns.toSeq shouldBe Seq("clean")
  }

  // --- full pipeline ----------------------------------------------------

  test("normalize: FIXTURES-style nested record round-trips to flat all-string row") {
    val json = Seq(
      """{"PO Number":"P-1","Detail":{"Status":"OK","Qty":5},"Lines":[{"n":1},{"n":2}]}""")
    val df = spark.read.option("primitivesAsString", "true").json(spark.createDataset(json))
    val out = Normalize.normalize(df)
    out.columns.sorted.toSeq shouldBe Seq("detail_qty", "detail_status", "lines", "po_number")
    val r = out.select("po_number", "detail_status", "detail_qty", "lines").head()
    // primitivesAsString applies inside nested arrays too -> "1", "2"
    r shouldBe Row("P-1", "OK", "5", """[{"n":"1"},{"n":"2"}]""")
  }
}

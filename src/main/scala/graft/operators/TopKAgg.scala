package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed per-group top-k as an Aggregator (SURVEY.md §2B UDF/UDAF row).
  *
  * Why it exists next to the window form (q16): `row_number() OVER
  * (PARTITION BY g ORDER BY v) <= k` must SORT every partition in full —
  * at 100 TB that is a total sort of the fact table. This aggregator keeps
  * a bounded k-element buffer per group (insert + drop-min, O(k) state),
  * gets map-side partial aggregation for free (reduce/merge), and never
  * holds more than k elements per group per task. The window form remains
  * right when the input is pre-sorted or k is unbounded.
  */
object TopKAgg {

  /** Keeps the k largest (value, id) pairs; descending by value, ties
    * broken by ascending id — deterministic, matching
    * `ORDER BY v DESC, id` window semantics.
    */
  final case class TopK(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

    override def zero: List[(Double, Long)] = Nil

    // descending by value, ascending id on ties; NaN sorts LAST (a bare
    // `>` is false for every NaN comparison, which would let a NaN row
    // insert at the HEAD while the buffer is under k — the operator is
    // generic, so it must keep the total-order nulls/NaN-last semantics
    // even though current callers never feed it NaN)
    private def before(a: (Double, Long), b: (Double, Long)): Boolean = {
      val an = a._1.isNaN
      val bn = b._1.isNaN
      if (an != bn) bn
      else if (an) a._2 < b._2
      else a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }

    /** One insertion step into an already-sorted buffer — O(k) per input
      * row (a full re-sort per row is O(k log k) and was the previous
      * shape; irrelevant at k=3, wrong to offer for large k).
      */
    private def insert(buf: List[(Double, Long)],
                       e: (Double, Long)): List[(Double, Long)] = {
      if (buf.lengthCompare(k) >= 0 && !before(e, buf.last)) buf
      else {
        val (hi, lo) = buf.span(before(_, e))
        (hi ::: e :: lo).take(k)
      }
    }

    override def reduce(buf: List[(Double, Long)],
                        e: (Double, Long)): List[(Double, Long)] = insert(buf, e)

    override def merge(a: List[(Double, Long)],
                       b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)

    override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

    override def bufferEncoder: Encoder[List[(Double, Long)]] =
      ExpressionEncoder[List[(Double, Long)]]()

    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Untyped convenience: top-k rows of `valueCol` per `groupCol`, output
    * as (group, rank, id, value) — one shuffle, bounded per-group state.
    */
  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                   idCol: String, k: Int): DataFrame = {
    val agg = udaf(TopK(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    df
      // null value/id rows cannot rank (and the primitive tuple encoder
      // would throw on them) — drop them, mirroring `ORDER BY v DESC`
      // nulls-last semantics for any k <= the non-null count
      .filter(col(valueCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(agg(col(valueCol).cast("double"), col(idCol).cast("long")).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("rank0", "pair")))
      .select(
        col(groupCol),
        (col("rank0") + 1).cast("long").as("rank"),
        col("pair._2").as(idCol),
        col("pair._1").as(valueCol))
  }
}

package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.7 "UDF/UDAF/UDTF surface"): exact top-k
  * values per group as a descending-sorted array.
  *
  * Scale: the buffer is bounded at k elements, so partial aggregation
  * (map-side combine) keeps shuffle traffic at O(groups * k) no matter
  * how many input rows — the property that makes per-group top-k safe
  * at 100 TB where collect_list would OOM.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  override def zero: Seq[Double] = Vector.empty
  override def reduce(b: Seq[Double], a: Double): Seq[Double] =
    if (b.length < k) (b :+ a).sortBy(-_)
    else if (a > b.last) (b.init :+ a).sortBy(-_)
    else b
  override def merge(x: Seq[Double], y: Seq[Double]): Seq[Double] =
    (x ++ y).sortBy(-_).take(k)
  override def finish(r: Seq[Double]): Seq[Double] = r
  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import graft.curves.{CPoint, Curves}

/** Unweighted ECDF build (curve_utils.rs:65-94 with no focus) as a Spark
  * `Aggregator` with PARTIAL AGGREGATION: the buffer is a (value → count)
  * map, so map-side combine shuffles one entry per distinct delay value
  * instead of one row per observation — the scale path SURVEY.md §4 flags
  * as the optional custom-aggregate work. Delay values are integral seconds
  * (quantized to 12 s on the pair path), so buffers are small and bounded.
  *
  * `finish` reproduces `Curves.makeCurve(values, None)` exactly, including
  * the endpoints forced to 0/1 and the lastX=0 quirk (verified by
  * EcdfAggregatorSpec property tests). Groups under `minSamples` or with
  * fewer than 2 distinct points yield an empty curve (callers filter).
  */
final class EcdfAggregator(minSamples: Int, simplifyEps: Float)
    extends Aggregator[Float, mutable.HashMap[Float, Long], Seq[CPoint]] {

  override def zero: mutable.HashMap[Float, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[Float, Long], a: Float): mutable.HashMap[Float, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.HashMap[Float, Long],
                     b2: mutable.HashMap[Float, Long]): mutable.HashMap[Float, Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
    big
  }

  override def finish(b: mutable.HashMap[Float, Long]): Seq[CPoint] = {
    val n = b.valuesIterator.sum
    if (n < minSamples) return Seq.empty
    val xs = b.keysIterator.toArray.sorted
    // makeCurve semantics: y(x) = (count of values < x + 1) / n at each
    // distinct x; a minimum of exactly 0.0 emits no point (lastX quirk).
    // Deliberately NOT delegated to Curves.makeCurveFromCells: this path
    // keeps exact Long counts where the cell form accumulates f32 weights
    // (differs past 2^24 samples); EcdfAggregatorSpec pins the two.
    val pts = new mutable.ArrayBuffer[CPoint](xs.length)
    var cumBefore = 0L
    var lastX = 0f
    xs.foreach { x =>
      if (x != lastX) {
        pts += CPoint(x, (cumBefore + 1).toFloat / n)
        lastX = x
      }
      cumBefore += b(x)
    }
    if (pts.length < 2) return Seq.empty
    pts(0) = CPoint(pts(0).x, 0f)
    pts(pts.length - 1) = CPoint(pts(pts.length - 1).x, 1f)
    Curves.simplify(pts.toArray, simplifyEps).toSeq
  }

  override def bufferEncoder: Encoder[mutable.HashMap[Float, Long]] =
    Encoders.kryo[mutable.HashMap[Float, Long]]

  override def outputEncoder: Encoder[Seq[CPoint]] = ExpressionEncoder[Seq[CPoint]]()
}

object EcdfAggregator {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.udaf

  /** Column form: `groupBy(keys).agg(ecdf(col("delay")))`. */
  def ecdf(delay: Column, minSamples: Int, simplifyEps: Float): Column =
    udaf(new EcdfAggregator(minSamples, simplifyEps)).apply(delay)
}

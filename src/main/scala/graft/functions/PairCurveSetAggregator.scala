package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import graft.curves.{CPoint, Curves}

/** One focused curve of a stop-pair curve set (A6). */
final case class FocusCurve(focus: Float, curve: Seq[CPoint])

/** Aggregated curve-set output; `entries` is empty below the F9 gate or when
  * no window yields a valid curve. */
final case class CurveSetResult(entries: Seq[FocusCurve], sample_size: Int)

/** A6 stop-pair curve-set build (specific_curves.rs:371-426) as a Spark
  * `Aggregator` with PARTIAL AGGREGATION: the buffer is a
  * ((d_s, d_e) → count) map, so map-side combine shuffles one entry per
  * distinct quantized pair instead of one row per observed pair — a hot
  * stop pair at 100 TB stays a bounded buffer (pairs are 12 s-quantized
  * with |d| < 3000, so ≤ ~500×500 cells, typically far fewer) instead of an
  * unbounded group in one task.
  *
  * `finish` runs the marker recursion and focused weighted ECDFs on the
  * weighted cells via [[Curves.makeCurveSetFromCells]]; groups with
  * ≤ `minPairs` pairs yield an empty result (F9, specific_curves.rs:344).
  */
final class PairCurveSetAggregator(minPairs: Int)
    extends Aggregator[(Float, Float), mutable.HashMap[(Float, Float), Long], CurveSetResult] {

  override def zero: mutable.HashMap[(Float, Float), Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[(Float, Float), Long],
                      a: (Float, Float)): mutable.HashMap[(Float, Float), Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.HashMap[(Float, Float), Long],
                     b2: mutable.HashMap[(Float, Float), Long]): mutable.HashMap[(Float, Float), Long] = {
    val (big, small) = if (b1.size >= b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (k, v) => big.update(k, big.getOrElse(k, 0L) + v) }
    big
  }

  override def finish(b: mutable.HashMap[(Float, Float), Long]): CurveSetResult = {
    val total = b.valuesIterator.sum
    if (total <= minPairs) return CurveSetResult(Seq.empty, 0)
    val cells = b.iterator
      .map { case ((ds, de), c) => (ds, de, c) }
      .toArray.sortBy(t => (t._1, t._2))
    Curves.makeCurveSetFromCells(cells) match {
      case None => CurveSetResult(Seq.empty, 0)
      case Some((set, sampleSize)) =>
        CurveSetResult(set.iterator.map { case (f, c) => FocusCurve(f, c.toSeq) }.toSeq,
          sampleSize)
    }
  }

  override def bufferEncoder: Encoder[mutable.HashMap[(Float, Float), Long]] =
    Encoders.kryo[mutable.HashMap[(Float, Float), Long]]

  override def outputEncoder: Encoder[CurveSetResult] = ExpressionEncoder[CurveSetResult]()
}

object PairCurveSetAggregator {
  /** Column form: `groupBy(keys).agg(curveSet(col("d_s"), col("d_e")))`. */
  def curveSet(dS: Column, dE: Column, minPairs: Int = 20): Column =
    udaf(new PairCurveSetAggregator(minPairs)).apply(dS, dE)
}

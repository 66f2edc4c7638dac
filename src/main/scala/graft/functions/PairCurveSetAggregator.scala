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

/** Open-addressed Long→Long counting map over two plain primitive arrays
  * (linear probing, ≤0.5 load). Key 0 (empty-slot marker) is carried in a
  * dedicated counter — packed key 0 = the very common (+0s, +0s) delay
  * pair. Only primitive-array + scalar fields, so kryo field-serializes it
  * directly (scala LongMap holds a function field kryo cannot restore),
  * and the heap cost is ~16 bytes per cell with ZERO per-entry objects —
  * object-agg buffers are JVM objects the memory manager cannot track, so
  * compactness here is a correctness-at-scale property, not a micro-opt:
  * the scale rehearsal OOMed a 32-thread/8 GB JVM with boxed tuple-keyed
  * HashMap buffers on 0.9 B pairs.
  */
final class PairCellMap(
    var keys: Array[Long],
    var values: Array[Long],
    var used: Int,
    var zeroCount: Long)
    extends Serializable with com.esotericsoftware.kryo.KryoSerializable {

  def this() = this(new Array[Long](32), new Array[Long](32), 0, 0L)

  // serialize only the LIVE cells (field serialization would ship the whole
  // ≥2×-oversized backing arrays — measured 40% extra shuffle volume)
  override def write(kryo: com.esotericsoftware.kryo.Kryo,
                     out: com.esotericsoftware.kryo.io.Output): Unit = {
    out.writeInt(used, true)
    out.writeLong(zeroCount, true)
    var i = 0
    while (i < keys.length) {
      if (keys(i) != 0L) { out.writeLong(keys(i)); out.writeLong(values(i), true) }
      i += 1
    }
  }

  override def read(kryo: com.esotericsoftware.kryo.Kryo,
                    in: com.esotericsoftware.kryo.io.Input): Unit = {
    val n = in.readInt(true)
    zeroCount = in.readLong(true)
    var cap = 32
    while (cap < (n + 1) * 2) cap <<= 1
    keys = new Array[Long](cap)
    values = new Array[Long](cap)
    used = 0
    var i = 0
    while (i < n) { insert(in.readLong(), in.readLong(true)); i += 1 }
  }

  private def insert(k: Long, c: Long): Unit = {
    val mask = keys.length - 1
    var i = (scala.util.hashing.byteswap64(k) & mask).toInt
    while (keys(i) != 0L && keys(i) != k) i = (i + 1) & mask
    if (keys(i) == 0L) { keys(i) = k; used += 1 }
    values(i) += c
  }

  def add(k: Long, c: Long): Unit = {
    if (k == 0L) { zeroCount += c; return }
    if ((used + 1) * 2 > keys.length) {
      val ok = keys; val ov = values
      keys = new Array[Long](ok.length * 2)
      values = new Array[Long](ok.length * 2)
      used = 0
      var i = 0
      while (i < ok.length) { if (ok(i) != 0L) insert(ok(i), ov(i)); i += 1 }
    }
    insert(k, c)
  }

  def cellCount: Int = used + (if (zeroCount > 0L) 1 else 0)

  def foreachCell(f: (Long, Long) => Unit): Unit = {
    if (zeroCount > 0L) f(0L, zeroCount)
    var i = 0
    while (i < keys.length) { if (keys(i) != 0L) f(keys(i), values(i)); i += 1 }
  }

  def totalCount: Long = {
    var t = zeroCount
    var i = 0
    while (i < keys.length) { if (keys(i) != 0L) t += values(i); i += 1 }
    t
  }
}

/** A6 stop-pair curve-set build (specific_curves.rs:371-426) as a Spark
  * `Aggregator` with PARTIAL AGGREGATION: the buffer is a
  * ((d_s, d_e) → count) [[PairCellMap]] keyed by the two floats' raw bits
  * packed into one Long, so map-side combine shuffles one compact cell per
  * distinct quantized pair instead of one row per observed pair — a hot
  * stop pair at 100 TB stays a bounded buffer (pairs are 12 s-quantized
  * with |d| < 3000, so ≤ ~500×500 cells, typically far fewer) instead of
  * an unbounded group in one task.
  *
  * `finish` runs the marker recursion and focused weighted ECDFs on the
  * weighted cells via [[Curves.makeCurveSetFromCells]]; groups with
  * ≤ `minPairs` pairs yield an empty result (F9, specific_curves.rs:344).
  */
final class PairCurveSetAggregator(minPairs: Int)
    extends Aggregator[(Float, Float), PairCellMap, CurveSetResult] {
  import PairCurveSetAggregator.pack

  override def zero: PairCellMap = new PairCellMap()

  override def reduce(b: PairCellMap, a: (Float, Float)): PairCellMap = {
    b.add(pack(a._1, a._2), 1L)
    b
  }

  override def merge(b1: PairCellMap, b2: PairCellMap): PairCellMap = {
    val (big, small) = if (b1.cellCount >= b2.cellCount) (b1, b2) else (b2, b1)
    small.foreachCell((k, c) => big.add(k, c))
    big
  }

  override def finish(b: PairCellMap): CurveSetResult = {
    if (b.totalCount <= minPairs) return CurveSetResult(Seq.empty, 0)
    val cells = new scala.collection.mutable.ArrayBuffer[(Float, Float, Long)](b.cellCount)
    b.foreachCell { (k, c) =>
      cells += ((java.lang.Float.intBitsToFloat((k >>> 32).toInt),
        java.lang.Float.intBitsToFloat(k.toInt), c))
    }
    Curves.makeCurveSetFromCells(cells.toArray.sortBy(t => (t._1, t._2))) match {
      case None => CurveSetResult(Seq.empty, 0)
      case Some((set, sampleSize)) =>
        CurveSetResult(set.iterator.map { case (f, c) => FocusCurve(f, c.toSeq) }.toSeq,
          sampleSize)
    }
  }

  override def bufferEncoder: Encoder[PairCellMap] = Encoders.kryo[PairCellMap]

  override def outputEncoder: Encoder[CurveSetResult] = ExpressionEncoder[CurveSetResult]()
}

object PairCurveSetAggregator {
  /** (d_s, d_e) → one Long key: raw float bits, d_s in the high half.
    * Lossless for any float; sorting happens on the decoded floats. */
  def pack(dS: Float, dE: Float): Long =
    (java.lang.Float.floatToRawIntBits(dS).toLong << 32) |
      (java.lang.Float.floatToRawIntBits(dE).toLong & 0xffffffffL)

  /** Column form: `groupBy(keys).agg(curveSet(col("d_s"), col("d_e")))`. */
  def curveSet(dS: Column, dE: Column, minPairs: Int = 20): Column =
    udaf(new PairCurveSetAggregator(minPairs)).apply(dS, dE)
}

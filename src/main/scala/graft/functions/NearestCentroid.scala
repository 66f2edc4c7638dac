package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Index of the nearest centroid (squared-L2, optionally on the
  * unit-normalized vector — spherical k-means — ties → lowest index) for an
  * embedding vector — the IVF coarse-quantizer assignment step as a native
  * Catalyst expression. The centroid matrix rides along as one reference
  * object (same pattern as [[HyperplaneSignatures]]); `doGenCode` keeps the
  * per-row assignment inside whole-stage codegen, so the one-pass corpus
  * assignment at 100 TB is a scan, not a UDF boundary.
  *
  * Distances accumulate `(v(i) - c(i))²` in Double left-to-right; the DuckDB
  * oracle's `list_distance` (Euclidean with sqrt) ranks identically because
  * sqrt is monotone.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]],
                           normalize: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = HyperplaneSignatures.doubles(input.asInstanceOf[ArrayData], isDouble)
    NearestCentroid.assign(vec, centroids, normalize)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.NearestCentroid.assign(
            graft.functions.HyperplaneSignatures.doubles($c, $isDouble), $centRef, $normalize)""")
  }
}

object NearestCentroid {

  /** `normalize = true` gives spherical assignment (vector scaled to unit
    * L2 first, in Double) — the right cell geometry when the rescoring
    * metric is cosine. */
  def assign(vec: Array[Double], centroids: Array[Array[Double]],
             normalize: Boolean): Int = {
    // pre-divide ONCE (bit-identical to dividing inside the distance loop,
    // same vec(i)/nrm op) — division is the slowest FP op and the inner
    // loop otherwise pays centroids × dims of them per row
    var v = vec
    if (normalize) {
      var s = 0.0
      var i = 0
      while (i < vec.length) { s += vec(i) * vec(i); i += 1 }
      val nrm = math.sqrt(s)
      if (nrm != 0.0 && nrm != 1.0) {
        v = new Array[Double](vec.length)
        var j = 0
        while (j < vec.length) { v(j) = vec(j) / nrm; j += 1 }
      }
    }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(v.length, cent.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  def apply(c: Column, centroids: Array[Array[Double]], normalize: Boolean): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      NearestCentroid(GraftColumnBridge.expression(c), centroids, normalize))
  }
}

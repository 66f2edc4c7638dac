package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All hyperplane-LSH table signatures of an embedding vector in ONE pass,
  * as a native Catalyst expression.
  *
  * The Column-composed equivalent (per table, per plane: `aggregate(zip_with(
  * vec, array(64 literals), multiply), sum)`) builds an expression tree of
  * ~3000 literal nodes for 12 tables × 4 planes × 64 dims — the analyzer,
  * optimizer and Janino each walk/compile the whole thing, which dominated
  * the ANN-LSH build wall time (~17 s of a 19 s query at sf0.1 on 2000
  * vectors). Here the planes ride along as one reference object and the
  * arithmetic is a tight loop; `doGenCode` keeps the call inside whole-stage
  * codegen.
  *
  * Bit-for-bit identical to the composed form: per plane, the dot product
  * sums `vec(i).toDouble * plane(i)` left-to-right from 0.0 (the exact
  * fold order of `aggregate(zip_with(...))`), and bit p of table t's
  * signature is set iff its dot product is strictly positive.
  *
  * Returns `array<bigint>` with one signature per table (index = table id).
  */
case class HyperplaneSignatures(child: Expression,
                                planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_signatures"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)

  // accept array<float> AND array<double> embeddings (a double-typed column
  // must not be read through toFloatArray — parquet dictionary decode throws)
  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = HyperplaneSignatures.doubles(input.asInstanceOf[ArrayData], isDouble)
    new GenericArrayData(HyperplaneSignatures.compute(vec, planes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"""new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.functions.HyperplaneSignatures.compute(
              graft.functions.HyperplaneSignatures.doubles($c, $isDouble), $planesRef))""")
  }
}

object HyperplaneSignatures {

  def widen(v: Array[Float]): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i).toDouble; i += 1 }
    out
  }

  /** Null-tolerant ArrayData → Array[Double] extraction shared by the
    * native vector expressions. A null ELEMENT counts as 0.0 in both
    * execution paths: UnsafeArrayData's primitive bulk copy already reads a
    * null slot as 0, and the generic path (in-memory rows, literals) would
    * NPE inside toDoubleArray/toFloatArray without the explicit loop —
    * same value either way, instead of a path-dependent crash. */
  def doubles(a: ArrayData, isDouble: Boolean): Array[Double] = a match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeArrayData =>
      if (isDouble) u.toDoubleArray() else widen(u.toFloatArray())
    case g =>
      val n = g.numElements()
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (!g.isNullAt(i))
          out(i) = if (isDouble) g.getDouble(i) else g.getFloat(i).toDouble
        i += 1
      }
      out
  }

  /** One 64-bit sign-bit signature per table; loop order matches the
    * Column-composed left-to-right double fold exactly. */
  def compute(vec: Array[Double], planes: Array[Array[Array[Double]]]): Array[Long] = {
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val table = planes(t)
      var sig = 0L
      var p = 0
      while (p < table.length) {
        val plane = table(p)
        val n = math.min(vec.length, plane.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += vec(i) * plane(i); i += 1 }
        if (acc > 0) sig |= 1L << p
        p += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  def apply(c: Column, planes: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HyperplaneSignatures(GraftColumnBridge.expression(c), planes))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language stopword-marker hit counts of a token array in ONE pass, as
  * a native Catalyst expression with codegen.
  *
  * The Column-composed form — one `size(filter(tokens, isInCollection))`
  * per language — evaluates four interpreted lambdas per document (Spark
  * never code-generates higher-order functions) and walks the token array
  * once per language. Here every token is probed against all marker sets in
  * a single pass over UTF8String hash sets held as one reference object,
  * inside whole-stage codegen.
  *
  * Count semantics are identical to the composed form (exact string
  * membership, nulls never match), so [[graft.ops.TextAnalysis.langIdCol]]'s
  * argmax — and its DuckDB oracle — are unchanged.
  *
  * Returns `array<int>`, one count per marker table, in input order.
  */
case class MarkerCounts(child: Expression, markers: Array[Array[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)

  // derived once per executor/deserialization, not per row
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    MarkerCounts.buildSets(markers)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MarkerCounts.compute(input.asInstanceOf[ArrayData], sets))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"""new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.functions.MarkerCounts.compute($c, $setsRef))""")
  }
}

object MarkerCounts {

  def buildSets(markers: Array[Array[String]]): Array[java.util.HashSet[UTF8String]] =
    markers.map { words =>
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }

  def compute(tokens: ArrayData,
              sets: Array[java.util.HashSet[UTF8String]]): Array[Int] = {
    val out = new Array[Int](sets.length)
    val m = tokens.numElements()
    var i = 0
    while (i < m) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        if (t != null) {
          var k = 0
          while (k < sets.length) {
            if (sets(k).contains(t)) out(k) += 1
            k += 1
          }
        }
      }
      i += 1
    }
    out
  }

  def apply(c: Column, markers: Seq[Seq[String]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      MarkerCounts(GraftColumnBridge.expression(c), markers.map(_.toArray).toArray))
  }
}

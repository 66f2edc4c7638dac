package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All word n-gram shingle hashes of a token array in ONE pass, as a native
  * Catalyst expression with codegen.
  *
  * The Column-composed form — `transform(sequence(0, m−n),
  * i => xxhash64(slice(toks, i+1, n)))` — is a higher-order function: Spark
  * evaluates the lambda interpreted, per window, allocating a slice array
  * each time, and the surrounding projection falls out of whole-stage
  * codegen. This expression runs the same computation as a tight loop over
  * the token array (no slices materialized) and `doGenCode` keeps it inside
  * the generated stage — the shingle index build is the dominant setup cost
  * of the whole dedup family.
  *
  * Bit-for-bit identical to the composed form: `xxhash64(array<string>)`
  * folds over the elements — `h = 42; for each token: h =
  * XXH64.hashUTF8String(token, h)` (nulls leave h unchanged) — which is
  * exactly the loop here, so every downstream consumer (df-cap, MinHash
  * seeds, bucket joins, the DuckDB string-shingle oracles) sees unchanged
  * values. Property-tested against the composed form.
  *
  * Returns `array<bigint>`, empty when the doc has fewer than n tokens.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.compute(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""new org.apache.spark.sql.catalyst.util.GenericArrayData(
            graft.functions.ShingleHashes.compute($c, $n))""")
}

object ShingleHashes {
  private val Seed = 42L // the xxhash64 SQL function's fixed seed

  def compute(tokens: ArrayData, n: Int): Array[Long] = {
    val m = tokens.numElements()
    if (m < n) return Array.emptyLongArray
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i < out.length) {
      var h = Seed
      var j = i
      while (j < i + n) {
        if (!tokens.isNullAt(j)) {
          val t = tokens.getUTF8String(j)
          if (t != null) h = XXH64.hashUTF8String(t, h)
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    out
  }

  def apply(c: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(c), n))
  }
}

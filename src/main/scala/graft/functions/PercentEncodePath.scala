package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** X14 — percent-encoding of a URL path element (reference
  * `src/monitor/mod.rs:25-27`: the `percent_encoding` crate's
  * `utf8_percent_encode` with `CONTROLS.add('/').add('?').add('"').add('`')`).
  * Per UTF-8 byte: ASCII controls (0x00-0x1F, 0x7F), the four path
  * delimiters and every non-ASCII byte (≥ 0x80, always encoded by the
  * crate) become `%XX` with UPPERCASE hex; all other bytes pass through.
  * Byte-level and total, so the DuckDB oracle can replay it with a
  * hex()-byte walk. */
case class PercentEncodePath(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "percent_encode_path"

  // non-string args fail analysis instead of CCE inside codegen
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override protected def withNewChildInternal(newChild: Expression): PercentEncodePath =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    PercentEncodePath.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PercentEncodePath.encode($c)")
}

object PercentEncodePath {

  private val Hex = "0123456789ABCDEF".toCharArray

  def shouldEscape(b: Int): Boolean =
    b >= 0x80 || b < 0x20 || b == 0x7f ||
      b == '/' || b == '?' || b == '"' || b == '`'

  def encode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (shouldEscape(b)) {
        sb.append('%').append(Hex(b >> 4)).append(Hex(b & 0xf))
      } else sb.append(b.toChar)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def apply(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PercentEncodePath(GraftColumnBridge.expression(c)))
  }
}

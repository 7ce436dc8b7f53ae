package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-gram construction — the shingle
  * step of the text-dedup family (n-gram Jaccard, MinHash).
  *
  * The higher-order formulation (`transform(sequence(...), i =>
  * concat_ws("_", element_at(tokens, i)...))` + `array_distinct`) is
  * INTERPRETED: every gram walks an expression tree with boxed index
  * arithmetic, and the dedup re-hashes the whole array afterwards. This
  * expression runs one tight loop over the token array inside whole-stage
  * codegen, deduplicating on the fly with first-occurrence order — the
  * exact order/content `array_distinct` produces, so swapping
  * implementations cannot change any result downstream.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.build(input.asInstanceOf[ArrayData], n)

  // The generated code calls the same primitive kernel as the interpreted
  // path (static forwarder on the companion class), so the two paths are
  // bit-identical by construction.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNgrams.build($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  private val Sep = UTF8String.fromString("_")

  /** One pass over the token array: join each window of `n` tokens with "_",
    * keep first occurrences only (LinkedHashSet — the order and content of
    * `array_distinct`). Tokens are expected non-null (split() output).
    */
  def build(arr: ArrayData, n: Int): GenericArrayData = {
    val num = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= num) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a single-space-tokenized string, as
  * one native expression. Semantics match the built-in composition
  * `array_distinct(transform(sequence(0, size(ws)-n), i ->
  * concat_ws(' ', ws[i+1..i+n])))` with the <n-words fallback of the
  * whole text — but in one generated-code loop instead of interpreted
  * higher-order lambdas (measured 9s → negligible for 5k docs at
  * sf0.1; the shingle stage was the q45/q46 bottleneck since Spark
  * recomputes it on every branch of the self-joins).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. Splits on single spaces (the
    * reference's tokenization), slides an n-word window, dedupes
    * preserving first occurrence (array_distinct parity).
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(Space, -1)
    if (words.length < n) {
      return new GenericArrayData(Array[Any](text))
    }
    val seen = new java.util.LinkedHashSet[UTF8String](words.length * 2)
    var i = 0
    val last = words.length - n
    while (i <= last) {
      // concat words[i..i+n-1] with single spaces
      var s = words(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, Space, words(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

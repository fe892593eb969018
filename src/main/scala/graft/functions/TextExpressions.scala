package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a native expression.
  *
  * The composable form — `transform(sequence(0, size-n), i ->
  * concat_ws(' ', slice(toks, i+1, n)))` — runs the lambda interpreted
  * per position and allocates a slice array per shingle, which dominates
  * MinHash pipelines (≈5µs per shingle). This expression builds all
  * shingles of a document in one loop and stays inside whole-stage
  * codegen. Semantics match `split(text, ' ')` + n-gram join with single
  * spaces: empty tokens from consecutive separators are kept, documents
  * with fewer than n tokens yield an empty array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {
  /** Static entry shared by eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object TextFunctions {
  /** All word n-grams of `text` (split on single spaces). */
  def wordShingles(text: Column, n: Int): Column =
    shim.column(WordShingles(shim.expression(text), n))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd overlap count of two ASCENDING-SORTED array<string>
  * columns — `size(array_intersect(a, b))` without the hash set or the
  * materialized intersection array.
  *
  * Why it exists (SURVEY.md §4.2's "built-ins can't keep up" bar):
  * `array_intersect` builds a hash set of one side and an output array
  * of the matches per ROW — for the set-similarity join's verification
  * that allocation runs once per CANDIDATE PAIR (3.5M pairs at sf0.1
  * for 256 survivors), and profiling put ~60% of q_setsim_prefix's
  * wall time there. On sorted inputs the same count is one allocation-
  * free two-pointer merge of binary string compares, inside
  * WholeStageCodegen.
  *
  * CONTRACT: both arrays must be sorted ascending by Spark's UTF8String
  * binary order (`array_sort` default) and duplicate-free — exactly
  * what the callers' `array_sort(transform(...))` over distinct shingle
  * sets produces. On equal elements both cursors advance (set
  * semantics). Null arrays → null; element nulls are the caller's
  * responsibility (shingle sets never contain them).
  *
  * Exactness: identical result to `size(array_intersect)` on the
  * contract inputs — the oracle's independent recount stays the
  * bit-exact compare it was.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native sorted-set expressions. */
object SetFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Overlap count of two ascending-sorted, duplicate-free
    * array<string> columns (= `size(array_intersect)`, allocation-free).
    */
  def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedOverlapCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

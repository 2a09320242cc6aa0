package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED (ascending, null-free, distinct) arrays as a
  * single merge walk — the verification kernel of set-similarity joins
  * (n-gram Jaccard, containment, hybrid lexical scoring).
  * `array_intersect` builds a hash set and an output array per row; for a
  * verify-only count on millions of candidate pairs that allocation
  * dominates. This is O(|A|+|B|) comparisons with zero allocation,
  * inside whole-stage codegen.
  *
  * Element types: `array<string>` or `array<long>` (both sides the
  * same). The long form is what the dedup operators use at scale —
  * 60-bit md5-derived shingle hashes (Dedup.shingleHash) shuffle ~2.5×
  * fewer bytes than the shingle strings and compare in one instruction.
  *
  * Caller contract: both inputs sorted ascending with distinct elements
  * (produced with `sort_array(array_distinct(...))`); unsorted input
  * undercounts silently.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => true
    case _ => false
  }
  private lazy val isLongElems = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def elemType(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => e
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType) &&
        elemType(left.dataType) == elemType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_count requires two array<string> or two " +
        s"array<long> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val c =
        if (isLongElems) java.lang.Long.compare(x.getLong(i), y.getLong(j))
        else x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c"); val cnt = ctx.freshName("cnt")
      val cmp =
        if (isLongElems) s"Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $cmp;
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override def prettyName: String = "graft_sorted_intersect_count"
}

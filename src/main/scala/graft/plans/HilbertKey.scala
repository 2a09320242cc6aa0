package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native 2-D Hilbert-curve key: the classic top-down quadrant walk
  * (quadrant index 3·rx XOR ry scaled by s², reflect/swap rotation) as
  * ONE generated loop over the bit levels.
  *
  * Motivation (SURVEY §7.4 tier (b)): the column form expressed the walk
  * as an `aggregate` fold over `sequence(bits-1, 0, -1)` with a
  * (x, y, d) struct accumulator — semantically exact, but higher-order
  * functions evaluate INTERPRETED in Spark (lambda + struct allocation
  * per level per row, outside whole-stage codegen), and the layout query
  * benched 16 s at sf0.1 where the Z-order equivalent runs in tenths.
  * Unrolling the levels as plain column expressions is not an option
  * either: each level's x and y both reference the previous level's x
  * AND y, so without subexpression sharing the tree doubles per level
  * (2^bits leaves). The kernel is the shape the computation wants — a
  * 16-iteration loop over two longs — at O(bits)/row inside codegen.
  *
  * Semantics are IDENTICAL to the fold (HilbertKeySpec asserts equality
  * against an independent reference walk): inputs must be non-negative
  * and fit `bits` bits; `bits` is a foldable int literal with
  * 2·bits <= 62 so the key fits a long. */
case class HilbertKey(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != LongType || second.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_hilbert_key requires two long coordinate args, got " +
          s"${first.dataType.simpleString} / ${second.dataType.simpleString}")
    if (third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_hilbert_key requires an int literal bits arg")
    third.eval() match {
      case b: Int if b < 1 || 2 * b > 62 =>
        TypeCheckResult.TypeCheckFailure(
          s"key width ${2 * b} must be in (0, 62], got bits=$b")
      case null =>
        TypeCheckResult.TypeCheckFailure("bits must not be null")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  private lazy val bits: Int = third.eval().asInstanceOf[Int]

  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HilbertKey =
    copy(first = f, second = s, third = t)

  override def nullSafeEval(xv: Any, yv: Any, bv: Any): Any = {
    var cx = xv.asInstanceOf[Long]
    var cy = yv.asInstanceOf[Long]
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((cx & s) > 0) 1L else 0L
      val ry = if ((cy & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { cx = s - 1 - cx; cy = s - 1 - cy }
        val t = cx; cx = cy; cy = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xv, yv, _) => {
      val cx = ctx.freshName("cx"); val cy = ctx.freshName("cy")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $cx = $xv; long $cy = $yv; long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = ($cx & $s) > 0 ? 1L : 0L;
         |  long $ry = ($cy & $s) > 0 ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $cx = $s - 1 - $cx; $cy = $s - 1 - $cy; }
         |    long $t = $cx; $cx = $cy; $cy = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override def prettyName: String = "graft_hilbert_key"
}

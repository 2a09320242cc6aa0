package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character-entropy parts: one pass over a string's
  * code points returning struct(n, s) where n is the code-point count
  * and s the exact decimal sum Σ_c round(cnt_c · ln(cnt_c), 9) over the
  * distinct-character counts, cast to double at the end.
  *
  * Bit-identical to the column composition it replaces in
  * [[graft.operators.TextAnalysis.charEntropy]]:
  *
  * {{{
  * explode(transform(sequence(1, length(txt)), i => substr(txt, i, 1)))
  *   -> groupBy(id, ch).count()                          // shuffle 1
  *   -> groupBy(id).agg(sum(cnt),                        // shuffle 2
  *        sum(round(cnt * log(cnt), 9).cast("decimal(28,9)")))
  * }}}
  *
  * Motivation (guide §2.4 "remove shuffles outright"): the aggregation is
  * entirely DOC-LOCAL — per-character rows never needed to leave their
  * document, yet the column form exploded every character of every
  * document into the cluster and shuffled them twice. This kernel keeps
  * the whole computation in-row: the query becomes a pure scan
  * (zero exchanges), which is the 100 TB shape for any per-doc statistic.
  *
  * Numeric contract, matching Catalyst step for step: characters are
  * code points (SQL substr/length semantics); per-character term =
  * cast(round(cnt·ln cnt, 9) as decimal(28,9)) where Round(double, 9) is
  * BigDecimal.valueOf(x).setScale(9, HALF_UP).doubleValue (the
  * ClassifierRoundParitySpec-pinned identity) and the decimal cast is
  * BigDecimal.valueOf(double).setScale(9, HALF_UP); terms sum exactly in
  * decimal (order-invariant), and s is that exact sum's doubleValue —
  * identical to sum(decimal(28,9)).cast("double").
  *
  * Null semantics: null text → (0L, 0.0), the same downstream outcome as
  * the old explode-of-empty-array path (doc absent from the aggregate →
  * n_chars 0, entropy null via log(0) = null). */
case class CharEntropyParts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy_parts requires a string arg, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false)))

  override def nullable: Boolean = false

  override protected def withNewChildInternal(newChild: Expression): CharEntropyParts =
    copy(child = newChild)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = child.eval(input)
    CharEntropyParts.compute(
      if (t == null) null else t.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cls = classOf[CharEntropyParts].getName
    ev.copy(
      code = childGen.code +
        code"""
          org.apache.spark.sql.catalyst.expressions.GenericInternalRow ${ev.value} =
            $cls.compute(${childGen.isNull} ? null : ${childGen.value});
        """,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "graft_char_entropy_parts"
}

object CharEntropyParts {

  def compute(txt: UTF8String): GenericInternalRow = {
    if (txt == null) return result(0L, 0.0)
    val s = txt.toString
    if (s.isEmpty) return result(0L, 0.0)
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var n = 0L
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      n += 1
      ci += Character.charCount(cp)
    }
    var sum = JBigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val cnt = it.next()(0)
      // Round(cnt * ln(cnt), 9) then cast decimal(28,9) — the exact
      // Catalyst steps (both via BigDecimal.valueOf = Double.toString)
      val rounded = JBigDecimal.valueOf(cnt * math.log(cnt.toDouble))
        .setScale(9, RoundingMode.HALF_UP).doubleValue()
      sum = sum.add(JBigDecimal.valueOf(rounded).setScale(9, RoundingMode.HALF_UP))
    }
    result(n, sum.doubleValue())
  }

  private def result(n: Long, s: Double): GenericInternalRow =
    new GenericInternalRow(Array[Any](n, s))
}

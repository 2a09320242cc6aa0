package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application over one word: split the word into
  * Unicode code points, apply each trained merge rule (lhs, rhs) in
  * training order as a greedy left-to-right pass (a just-merged symbol
  * can match the LEFT side of the same rule at a later position — the
  * trainer's exact fold), and return the surviving symbol count.
  *
  * Motivation (SURVEY §7.4 tier (b), the GramBucketShares / HilbertKey
  * discipline): the column form nested one interpreted `aggregate(...)`
  * HOF per merge rule over every word of every document — a lambda
  * invocation plus array/struct allocation per element per rule, with
  * plan depth O(rules). It was the slowest query on the round-9 board
  * (`t_bpe_encode`, 6.8 s at sf0.1). This kernel runs ALL rules over a
  * word in ONE compiled method with a single in-place symbol array —
  * O(len * rules) comparisons, zero allocation beyond the array, and
  * constant plan depth at any rule count (a real 32k-merge vocabulary
  * would not even Janino-compile in the nested form).
  *
  * Numeric/semantic contract (pinned by `t_bpe_encode`'s CTE-replay
  * oracle): symbols are code points exactly as SQL `substr(i, 1)` yields
  * them; each rule is a full left-to-right pass comparing the CURRENT
  * (possibly already-merged) previous symbol to `lhs` and the next
  * original symbol to `rhs`; rules apply strictly in the given order.
  * Hash-identical to the nested-aggregate fold it replaces.
  *
  * The merge table rides the expression as two FOLDABLE array<string>
  * literals (training order), evaluated once per plan and shipped to
  * generated code via `addReferenceObj` — per-row work never touches
  * ArrayData for the rules.
  *
  * Null semantics: null word → null (matching the old fold, where a null
  * word poisoned sequence/transform/aggregate).
  */
case class BpeTokenCount(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStrArray(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (first.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_token_count requires a string word arg, got ${first.dataType.simpleString}")
    if (!isStrArray(second.dataType) || !second.foldable ||
        !isStrArray(third.dataType) || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_bpe_token_count requires foldable array<string> (lhs, rhs) merge args")
    val nl = Option(second.eval()).map(_.asInstanceOf[ArrayData].numElements())
    val nr = Option(third.eval()).map(_.asInstanceOf[ArrayData].numElements())
    if (nl.isEmpty || nr.isEmpty)
      TypeCheckResult.TypeCheckFailure("merge arrays must be non-null")
    else if (nl != nr)
      TypeCheckResult.TypeCheckFailure(
        s"merge lhs/rhs lengths differ: ${nl.get} vs ${nr.get}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = first.nullable

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeTokenCount =
    copy(first = newFirst, second = newSecond, third = newThird)

  @transient private lazy val mergeLhs: Array[String] = BpeTokenCount.strings(second)
  @transient private lazy val mergeRhs: Array[String] = BpeTokenCount.strings(third)

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    BpeTokenCount.compute(w.asInstanceOf[UTF8String], mergeLhs, mergeRhs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // merge tables as compile-time reference objects — the generated loop
    // never re-parses the array literals per row
    val lhsRef = ctx.addReferenceObj("bpeLhs", mergeLhs, "java.lang.String[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", mergeRhs, "java.lang.String[]")
    val cls = BpeTokenCount.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = $cls.compute($w, $lhsRef, $rhsRef);")
  }

  override def prettyName: String = "graft_bpe_token_count"
}

/** Whole-document BPE token-count sum: [[BpeTokenCount]] applied to every
  * word of a token array and summed, in ONE native call per document —
  * bit-identical to the HOF composition it replaces in
  * [[graft.operators.TextAnalysis.bpeEncode]]:
  *
  * {{{ aggregate(transform(toks, w => graft_bpe_token_count(w, lhs, rhs)
  *       .cast("long")), 0L, (acc, x) => acc + x) }}}
  *
  * Motivation (guide §4 — the same interpreted-HOF trap the per-word
  * kernel fixed one level down): `transform` and `aggregate` are not
  * whole-stage-codegen'd; per document they pay an interpreted lambda
  * dispatch per word plus an intermediate long-array allocation, just to
  * add up results of an already-native kernel. This fuses the loop.
  *
  * Null semantics, matching the fold exactly: null token array → null;
  * any null ELEMENT → null sum (the null element's count null-poisons
  * the running `acc + x`). */
case class BpeTokenSum(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isStrArray(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!isStrArray(first.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_token_sum requires an array<string> tokens arg, got ${first.dataType.simpleString}")
    if (!isStrArray(second.dataType) || !second.foldable ||
        !isStrArray(third.dataType) || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_bpe_token_sum requires foldable array<string> (lhs, rhs) merge args")
    val nl = Option(second.eval()).map(_.asInstanceOf[ArrayData].numElements())
    val nr = Option(third.eval()).map(_.asInstanceOf[ArrayData].numElements())
    if (nl.isEmpty || nr.isEmpty)
      TypeCheckResult.TypeCheckFailure("merge arrays must be non-null")
    else if (nl != nr)
      TypeCheckResult.TypeCheckFailure(
        s"merge lhs/rhs lengths differ: ${nl.get} vs ${nr.get}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeTokenSum =
    copy(first = newFirst, second = newSecond, third = newThird)

  @transient private lazy val mergeLhs: Array[String] = BpeTokenCount.strings(second)
  @transient private lazy val mergeRhs: Array[String] = BpeTokenCount.strings(third)

  override def nullSafeEval(toks: Any, l: Any, r: Any): Any =
    BpeTokenSum.compute(toks.asInstanceOf[ArrayData], mergeLhs, mergeRhs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lhsRef = ctx.addReferenceObj("bpeLhs", mergeLhs, "java.lang.String[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", mergeRhs, "java.lang.String[]")
    val cls = BpeTokenSum.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (toks, _, _) => {
      s"""
        java.lang.Long ${ev.value}Boxed = $cls.compute($toks, $lhsRef, $rhsRef);
        if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}Boxed.longValue(); }
      """
    })
  }

  override def prettyName: String = "graft_bpe_token_sum"
}

object BpeTokenSum {
  /** Sum of per-word merge-surviving symbol counts; null on any null
    * element (the old fold's poison semantics). Boxed return so codegen
    * and interpreted eval share the null channel. */
  def compute(toks: ArrayData, lhs: Array[String],
              rhs: Array[String]): java.lang.Long = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      sum += BpeTokenCount.compute(toks.getUTF8String(i), lhs, rhs)
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

object BpeTokenCount {
  private[plans] def strings(e: Expression): Array[String] = {
    val ad = e.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i =>
      if (ad.isNullAt(i)) null else ad.getUTF8String(i).toString)
  }

  def compute(word: UTF8String, lhs: Array[String], rhs: Array[String]): Int = {
    val s = word.toString
    // symbols = code points (what SQL substr(i, 1) yields) — not UTF-16
    // code units; in-place greedy merge reuses one array (write index
    // never passes the read index)
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0
    val syms = new Array[String](n)
    var ci = 0
    var k = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      syms(k) = new String(Character.toChars(cp))
      k += 1
      ci += Character.charCount(cp)
    }
    var len = n
    var m = 0
    while (m < lhs.length) {
      val a = lhs(m)
      val b = rhs(m)
      var out = 0
      var i = 0
      var ab: String = null
      while (i < len) {
        val x = syms(i)
        if (out > 0 && b == x && a == syms(out - 1)) {
          if (ab == null) ab = a + b
          syms(out - 1) = ab
        } else {
          syms(out) = x
          out += 1
        }
        i += 1
      }
      len = out
      m += 1
    }
    len
  }
}

package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native SimHash fingerprint over a token array — bit-identical to the
  * HOF composition it replaces in [[graft.operators.Dedup.simhash]]:
  *
  * {{{
  * hs   = transform(toks, w => md5(w))
  * s_b  = aggregate(hs, 0L, (acc, h) => acc + contrib(h, b))   // per bit b
  * sim  = Σ_b (s_b > 0 ? 1L << b : 0)
  * // contrib(h, b): digit = conv(substring(h, 1 + b/4, 1), 16, 10) — the
  * // (b/4)-th hex nibble of the token's md5 — and ±1 by bit (b%4) of it.
  * }}}
  *
  * Motivation (guide §4 — per-task work): the column form materializes a
  * hex-string array per document and then runs `bits` separate
  * `aggregate` folds over it, each paying substring/conv/branch
  * expression evaluation per element — O(|toks| * bits) expression
  * dispatches and a giant codegen body. This kernel computes one md5 per
  * token (thread-local MessageDigest, no hex string) and updates all
  * `bits` counters from the raw digest nibbles in a tight loop.
  *
  * Null semantics, matching the HOF form exactly: null token array →
  * null; a null ELEMENT contributes −1 to every bit counter (md5(null)
  * is null, so contrib's `when` falls through to the −1 branch). The
  * empty array yields fingerprint 0 (all counters 0, none > 0) — callers
  * filter `size(toks) > 0` first, as before. */
case class SimhashFingerprint(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires an array<string> token arg, got ${left.dataType.simpleString}")
    if (right.dataType != IntegerType || !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_simhash requires an int literal bits arg")
    right.eval() match {
      case b: Int if b < 1 || b > 48 =>
        TypeCheckResult.TypeCheckFailure(
          s"bits must be in [1, 48] (signed-long safety, as Dedup.simhash requires), got $b")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashFingerprint =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(toks: Any, bits: Any): Any =
    SimhashFingerprint.compute(toks.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, bits) => {
      val cls = classOf[SimhashFingerprint].getName
      s"${ev.value} = $cls.compute($toks, $bits);"
    })

  override def prettyName: String = "graft_simhash"
}

object SimhashFingerprint {
  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData, bits: Int): Long = {
    val n = toks.numElements()
    val acc = new Array[Long](bits)
    val md = mdTL.get()
    val digest = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        // md5(null) is null → contrib's when() misses → otherwise(−1)
        var b = 0
        while (b < bits) { acc(b) -= 1L; b += 1 }
      } else {
        md.reset()
        md.update(toks.getUTF8String(i).getBytes)
        md.digest(digest, 0, 16)
        var b = 0
        while (b < bits) {
          val j = b / 4 // hex-digit index: even = high nibble of byte j/2
          val nib =
            if ((j & 1) == 0) (digest(j / 2) >> 4) & 0xf
            else digest(j / 2) & 0xf
          if (((nib >> (b % 4)) & 1) == 1) acc(b) += 1L else acc(b) -= 1L
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < bits) {
      if (acc(b) > 0) sim |= 1L << b
      b += 1
    }
    sim
  }
}

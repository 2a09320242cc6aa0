package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints over a token array — bit-identical to
  * the HOF composition it replaces in
  * [[graft.operators.TextAnalysis]]'s `winnowed` core:
  *
  * {{{
  * hs  = transform(sequence(0, size(toks) - k),
  *         i => md5(concat_ws(" ", toks[i+1 .. i+k])))       // per k-gram
  * fps = transform(sequence(1, size(hs)),
  *         i => array_min(slice(hs, i, window)))             // window min
  * }}}
  *
  * Motivation (guide §4): the column form materializes the full hex-
  * string gram array and then, per position, allocates a `slice` array
  * and re-walks it in `array_min` — O(m·window) UTF8String comparisons
  * plus m slice allocations per document. This kernel computes each
  * gram digest once (thread-local MessageDigest, byte compare — hex
  * encoding is monotone, so unsigned-byte order IS hex order), takes
  * the per-position window minimum with a monotonic deque in O(m), and
  * hex-encodes each distinct winning position once (repeated winners
  * share one UTF8String).
  *
  * Null semantics, matching the HOF form: null token array → null; null
  * token ELEMENTS are skipped by concat_ws. Caller guarantees
  * size(toks) >= k; smaller inputs yield the empty array. */
case class WinnowFingerprints(first: Expression, second: Expression,
                              third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_winnow_fps requires an array<string> token arg, got " +
          s"${first.dataType.simpleString}")
    if (second.dataType != IntegerType || !second.foldable ||
        third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_winnow_fps requires int literal (k, window) args")
    (second.eval(), third.eval()) match {
      case (k: Int, _) if k < 1 =>
        TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
      case (_, w: Int) if w < 1 =>
        TypeCheckResult.TypeCheckFailure(s"window must be >= 1, got $w")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowFingerprints =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(toks: Any, k: Any, w: Any): Any =
    WinnowFingerprints.compute(toks.asInstanceOf[ArrayData],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, k, w) => {
      val cls = classOf[WinnowFingerprints].getName
      s"${ev.value} = $cls.compute($toks, $k, $w);"
    })

  override def prettyName: String = "graft_winnow_fps"
}

object WinnowFingerprints {
  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars: Array[Byte] = "0123456789abcdef".getBytes("UTF-8")

  def compute(toks: ArrayData, k: Int, window: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = mdTL.get()
    var buf = new Array[Byte](64)
    val digests = new Array[Array[Byte]](m)
    // repeated grams are the norm on repetitive corpora: memoize
    // gram-bytes → digest so each distinct gram is md5'd once (duplicate
    // positions share the digest array — value-equal, so the window min
    // below is unchanged)
    val memo = new java.util.HashMap[java.nio.ByteBuffer, Array[Byte]](m * 2)
    var g = 0
    while (g < m) {
      var len = 0
      var firstTok = true
      var j = 0
      while (j < k) {
        val t = tb(g + j)
        if (t != null) {
          val need = len + t.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!firstTok) { buf(len) = ' '; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          firstTok = false
        }
        j += 1
      }
      val key = java.nio.ByteBuffer.wrap(java.util.Arrays.copyOf(buf, len))
      var d = memo.get(key)
      if (d == null) {
        md.reset()
        md.update(buf, 0, len)
        d = md.digest()
        memo.put(key, d)
      }
      digests(g) = d
      g += 1
    }
    // per-position window minimum fps[i] = min(digests[i .. i+window-1])
    // (right-truncated), via a monotonic deque over digest byte order —
    // identical to array_min over the hex slice (hex encoding is a
    // monotone byte-wise map). Scan RIGHT-TO-LEFT so each position's
    // window [i, i+window) is the deque's front.
    val out = new Array[AnyRef](m)
    val hexCache = new Array[UTF8String](m)
    val deque = new Array[Int](m)
    var head = 0
    var tail = -1 // inclusive
    i = m - 1
    while (i >= 0) {
      // drop indices beyond this window's right edge
      while (tail >= head && deque(head) >= i + window) head += 1
      // maintain increasing digest order from front
      while (tail >= head && unsignedLeq(digests(i), digests(deque(tail)))) tail -= 1
      tail += 1
      deque(tail) = i
      val winner = deque(head)
      if (hexCache(winner) == null) hexCache(winner) = hexOf(digests(winner))
      out(i) = hexCache(winner)
      i -= 1
    }
    new GenericArrayData(out)
  }

  private def hexOf(d: Array[Byte]): UTF8String = {
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      val v = d(b) & 0xff
      hex(2 * b) = hexChars(v >> 4)
      hex(2 * b + 1) = hexChars(v & 0xf)
      b += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** a <= b as unsigned bytes. On ties the NEWER (leftmost, since we
    * scan right-to-left) index replaces the older — equal digests render
    * identical hex, so the min VALUE is unchanged either way. */
  private def unsignedLeq(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    true
  }
}

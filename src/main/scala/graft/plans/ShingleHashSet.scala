package graft.plans

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native sorted-distinct hashed-shingle set over a token array —
  * bit-identical to the HOF composition it replaces in
  * [[graft.operators.Dedup.hashedShingleSets]]:
  *
  * {{{ sort_array(array_distinct(transform(shingles(toks, k), shingleHash(_)))) }}}
  *
  * where `shingles` is the distinct word-k-shingle array (k consecutive
  * tokens joined by one space) and `shingleHash` is
  * `conv(substring(md5(s), 1, 15), 16, 10).cast("long")` — the top 60
  * bits of the shingle's md5 as a non-negative long.
  *
  * Motivation (guide §4 — per-task work on the set-similarity index
  * head shared by ngramJaccard / containment / hybrid retrieval /
  * fingerprintOverlap / decontamination): the column form materializes
  * the shingle STRING array, a 32-char hex string per shingle, parses 15
  * hex digits back through `conv`'s string arithmetic, builds an
  * array_distinct hash set of boxed longs, and sorts boxed elements.
  * This kernel assembles each shingle's UTF-8 bytes in a reusable
  * buffer, md5s them with a thread-local MessageDigest, takes the top 60
  * bits straight from the digest bytes, and dedups + sorts a primitive
  * long array. One pass, no string intermediates.
  *
  * Null semantics, matching the HOF form exactly: null token array →
  * null; null token ELEMENTS are skipped by the join (concat_ws ignores
  * nulls). Caller guarantees size(toks) >= k (the operators filter
  * first); for n < k inputs the kernel returns the empty array, which
  * is what sequence()-underflow-free callers would observe. */
case class ShingleHashSet(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hash_set requires an array<string> token arg, " +
          s"got ${left.dataType.simpleString}")
    if (right.dataType != IntegerType || !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_shingle_hash_set requires an int literal k arg")
    right.eval() match {
      case k: Int if k < 1 =>
        TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHashSet =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(toks: Any, k: Any): Any =
    ShingleHashSet.compute(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, k) => {
      val cls = classOf[ShingleHashSet].getName
      s"${ev.value} = $cls.compute($toks, $k);"
    })

  override def prettyName: String = "graft_shingle_hash_set"
}

object ShingleHashSet {
  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(new Array[Long](0))
    // token bytes once (getUTF8String allocates a view; getBytes may copy)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = mdTL.get()
    val digest = new Array[Byte](16)
    var buf = new Array[Byte](64)
    val hashes = new Array[Long](m)
    // duplicate shingles are the NORM on repetitive corpora; hash each
    // distinct shingle STRING once (the old shingles() deduped strings
    // before md5 — matching that economy matters as much as the values)
    val seen = new java.util.HashSet[java.nio.ByteBuffer](m * 2)
    var nd = 0
    var g = 0
    while (g < m) {
      // shingle bytes = non-null tokens g..g+k-1 joined by ' '
      // (concat_ws semantics: null elements are skipped entirely)
      var len = 0
      var first = true
      var j = 0
      while (j < k) {
        val t = tb(g + j)
        if (t != null) {
          val need = len + t.length + 1
          if (need > buf.length) buf = Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (!first) { buf(len) = ' '; len += 1 }
          System.arraycopy(t, 0, buf, len, t.length)
          len += t.length
          first = false
        }
        j += 1
      }
      if (seen.add(java.nio.ByteBuffer.wrap(Arrays.copyOf(buf, len)))) {
        md.reset()
        md.update(buf, 0, len)
        md.digest(digest, 0, 16)
        // first 15 hex digits = bytes 0..6 (14 digits) + high nibble of
        // byte 7 — exactly conv(substring(hex, 1, 15), 16, 10) as a long
        var v = 0L
        var b = 0
        while (b < 7) { v = (v << 8) | (digest(b) & 0xffL); b += 1 }
        v = (v << 4) | ((digest(7) & 0xffL) >> 4)
        hashes(nd) = v
        nd += 1
      }
      g += 1
    }
    // ascending sort + dedup (distinct STRINGS can still collide in the
    // 60-bit hash; the old array_distinct-after-hash collapsed those)
    java.util.Arrays.sort(hashes, 0, nd)
    var w = if (nd == 0) 0 else 1
    var r = 1
    while (r < nd) {
      if (hashes(r) != hashes(w - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(Arrays.copyOf(hashes, w))
  }
}

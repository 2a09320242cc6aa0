package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over a shingle array: component h (h in
  * [0, numHashes)) is the lexicographic minimum over the shingle set of
  * `md5(h || "|" || shingle)` as a lowercase hex string — bit-identical
  * to the HOF composition it replaces in
  * [[graft.operators.Dedup.minhashSignatureArray]]:
  *
  * {{{ array((0 until n).map(h =>
  *       array_min(transform(sh, s => md5(concat(lit(h.toLong).cast("string"), lit("|"), s)))))) }}}
  *
  * Motivation (guide §1/§4 — the signature pass is the shared head of
  * ~25 dedup/graph/LSH bench queries): the column form evaluates
  * `numHashes` separate `transform` passes over the shingle array, each
  * allocating a full array of 32-char hex strings, and every element
  * evaluation pays a `concat` allocation plus commons-codec's
  * per-call `MessageDigest.getInstance` inside Spark's `Md5`, then
  * `array_min` re-walks each hex array with UTF8String comparisons.
  * This kernel is ONE pass over the shingle array: a thread-local
  * MessageDigest is re-seeded per (seed, shingle), the 16-byte digests
  * are compared as unsigned bytes (hex encoding is monotone byte-wise,
  * so unsigned-byte order IS lowercase-hex lexicographic order), and
  * only the numHashes winning digests are hex-encoded at the end.
  * O(|sh| * numHashes) md5 work — the same md5 count as before (the
  * values pin it) — with zero per-shingle string/array allocation.
  *
  * Null semantics, matching the HOF form exactly: null shingle array →
  * null; null ELEMENTS are skipped (md5(concat(.., null)) is null and
  * `array_min` ignores nulls); an empty array or all-null elements →
  * every component null (array_min of nothing). */
case class MinhashSignature(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val arrOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!arrOk)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_signature requires an array<string> shingle arg, " +
          s"got ${left.dataType.simpleString}")
    if (right.dataType != IntegerType || !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_minhash_signature requires an int literal numHashes arg")
    right.eval() match {
      case n: Int if n < 1 || n > MinhashSignature.MaxHashes =>
        TypeCheckResult.TypeCheckFailure(
          s"numHashes must be in [1, ${MinhashSignature.MaxHashes}], got $n")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = left.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashSignature =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(sh: Any, n: Any): Any =
    MinhashSignature.compute(sh.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, n) => {
      // companion-object static forwarder (the GramBucketShares pattern):
      // the hot loop lives in ONE compiled method, codegen only wires it
      val cls = classOf[MinhashSignature].getName
      s"${ev.value} = $cls.compute($sh, $n);"
    })

  override def prettyName: String = "graft_minhash_signature"
}

object MinhashSignature {
  /** Seeds render as decimal-string prefixes; 1024 is far above any real
    * signature width and keeps the prefix cache small. */
  val MaxHashes: Int = 1024

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** "h|" UTF-8 prefixes for the seed space, built once. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(MaxHashes)(h => (h.toString + "|").getBytes("UTF-8"))

  private val hexChars: Array[Byte] = "0123456789abcdef".getBytes("UTF-8")

  def compute(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    // winning digests, flat: slot h occupies [h*16, h*16+16); hasMin(h)
    // marks a slot that has seen at least one non-null shingle
    val mins = new Array[Byte](numHashes * 16)
    var seen = false
    val md = mdTL.get()
    val scratch = new Array[Byte](16)
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val bytes = sh.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(prefixes(h))
          md.update(bytes)
          md.digest(scratch, 0, 16)
          if (!seen || unsignedLess(scratch, mins, h * 16)) {
            System.arraycopy(scratch, 0, mins, h * 16, 16)
          }
          h += 1
        }
        seen = true
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    if (seen) {
      var h = 0
      while (h < numHashes) {
        val hex = new Array[Byte](32)
        var b = 0
        while (b < 16) {
          val v = mins(h * 16 + b) & 0xff
          hex(2 * b) = hexChars(v >> 4)
          hex(2 * b + 1) = hexChars(v & 0xf)
          b += 1
        }
        out(h) = UTF8String.fromBytes(hex)
        h += 1
      }
    }
    // !seen: out stays all-null — array_min over an empty/all-null
    // transform result is null per component
    new GenericArrayData(out)
  }

  /** scratch < mins[off..off+16) as unsigned bytes — identical order to
    * comparing the lowercase-hex encodings lexicographically. */
  private def unsignedLess(scratch: Array[Byte], mins: Array[Byte], off: Int): Boolean = {
    var b = 0
    while (b < 16) {
      val c = (scratch(b) & 0xff) - (mins(off + b) & 0xff)
      if (c != 0) return c < 0
      b += 1
    }
    false
  }
}

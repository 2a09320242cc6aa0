package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-prefix hash: the long value of the first `n` lowercase hex
  * characters of md5(key) — bit-identical to the engine-portable hash
  * convention used across the sketch/sampling tier:
  *
  * {{{ conv(substring(md5(key), 1, n), 16, 10).cast("long") }}}
  *
  * Motivation (guide §1.2 "per-task work", §4 — the r16 kernel recipe):
  * the column form hex-encodes all 16 digest bytes into a 32-char
  * UTF8String (commons-codec pays `MessageDigest.getInstance` per call
  * inside Spark's `Md5`), copies an n-char substring, and then `conv`
  * parses the string back digit-by-digit through NumberConverter. The
  * value is just the first 4n bits of the digest: this kernel reads them
  * straight off the raw digest bytes with a thread-local MessageDigest —
  * zero string intermediates. Used per occurrence row by the CMS/bloom
  * builders, per distinct value by HLL/KMV, and per row by every
  * hash-gated sampler, so the saving multiplies across ~40 queries.
  *
  * Null semantics: null key → null (matching md5/conv null propagation).
  * `n` must be a foldable int in [1, 15] (4n <= 60 bits keeps the value
  * exact in a long, the same bound the column form relied on). */
case class Md5PrefixLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_md5_prefix_long requires a string key arg, got ${left.dataType.simpleString}")
    if (right.dataType != IntegerType || !right.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_md5_prefix_long requires an int literal nChars arg")
    right.eval() match {
      case n: Int if n < 1 || n > 15 =>
        TypeCheckResult.TypeCheckFailure(s"nChars must be in [1, 15], got $n")
      case null =>
        TypeCheckResult.TypeCheckFailure("nChars must be non-null")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5PrefixLong =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(key: Any, n: Any): Any =
    Md5PrefixLong.compute(key.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, n) => {
      val cls = classOf[Md5PrefixLong].getName
      s"${ev.value} = $cls.compute($key, $n);"
    })

  override def prettyName: String = "graft_md5_prefix_long"
}

object Md5PrefixLong {
  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Value of the first n hex nibbles of md5(key), n <= 15. */
  def compute(key: UTF8String, n: Int): Long = {
    val md = mdTL.get()
    md.reset()
    val digest = md.digest(key.getBytes)
    prefixBits(digest, 0, n)
  }

  /** Long value of nibbles [from, from+n) of a digest (nibble 0 = high
    * half of byte 0 — exactly hex-string character order). */
  private[plans] def prefixBits(digest: Array[Byte], from: Int, n: Int): Long = {
    var v = 0L
    var i = from
    val end = from + n
    while (i < end) {
      val b = digest(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Native Kirsch-Mitzenmacher double-hash positions — the k Bloom bit
  * positions / Count-Min bucket columns of a key, bit-identical to the
  * column form shared by [[graft.operators.Sketches]]' bloom and CMS
  * builders (and the streaming windowed-CMS builder):
  *
  * {{{
  * val hex = md5(key)
  * val h1 = conv(substring(hex, 1, 15), 16, 10).cast("long") % width
  * val h2raw = conv(substring(hex, 16, 15), 16, 10).cast("long") % width
  * val h2 = h2raw + 1 - (h2raw % 2)                      // forced odd
  * transform(sequence(lit(0), lit(k - 1)), i => (h1 + i * h2) % width)
  * }}}
  *
  * Motivation (guide §4): per key the column form pays one 32-char hex
  * encode, two substring copies, two NumberConverter base-16 parses, a
  * `sequence` array allocation and an interpreted `transform` HOF pass.
  * This kernel computes both 60-bit halves straight from the raw digest
  * and fills one primitive long array — per occurrence row of the
  * CMS/bloom build streams, the hottest expression of the sketch tier.
  *
  * Null semantics, matching the HOF form exactly: a null key yields an
  * ARRAY OF k NULLS (the sequence array is non-null; every element's
  * arithmetic null-poisons), not a null array — so the expression itself
  * is never null. */
case class KmPositions(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_km_positions requires a string key arg, got ${first.dataType.simpleString}")
    if (second.dataType != IntegerType || !second.foldable ||
        third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_km_positions requires foldable int (width, k) args")
    (second.eval(), third.eval()) match {
      case (w: Int, k: Int) if w >= 2 && k >= 1 && k <= 64 =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_km_positions needs width >= 2 and k in [1, 64], got $other")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): KmPositions =
    copy(first = newFirst, second = newSecond, third = newThird)

  @transient private lazy val widthN: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val kN: Int = third.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val key = first.eval(input)
    if (key == null) KmPositions.nullsArray(kN)
    else KmPositions.compute(key.asInstanceOf[UTF8String], widthN, kN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyGen = first.genCode(ctx)
    val cls = classOf[KmPositions].getName
    ev.copy(
      code = keyGen.code +
        code"""
          org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
            ${keyGen.isNull} ? $cls.nullsArray($kN)
              : $cls.compute(${keyGen.value}, $widthN, $kN);
        """,
      isNull = FalseLiteral)
  }

  override def prettyName: String = "graft_km_positions"
}

object KmPositions {
  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def nullsArray(k: Int): ArrayData = new GenericArrayData(new Array[Any](k))

  def compute(key: UTF8String, width: Int, k: Int): ArrayData = {
    val md = mdTL.get()
    md.reset()
    val digest = md.digest(key.getBytes)
    val h1 = Md5PrefixLong.prefixBits(digest, 0, 15) % width
    val h2raw = Md5PrefixLong.prefixBits(digest, 15, 15) % width
    val h2 = h2raw + 1L - (h2raw % 2L)
    val out = new Array[Long](k)
    var r = 0
    while (r < k) {
      out(r) = (h1 + r * h2) % width
      r += 1
    }
    new GenericArrayData(out)
  }
}

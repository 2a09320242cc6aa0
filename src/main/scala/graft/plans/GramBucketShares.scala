package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed character-n-gram bucket shares over a string column:
  * slide every `n`-code-point gram of the text, hash each gram to one of
  * `buckets` slots by the leading hex digits of its md5 (k digits, k the
  * smallest count with 16^k >= buckets — one digit at the historical
  * B=16, so those hashes are unchanged), and return the length-`buckets`
  * array of count-normalized shares (all-zero when the text is shorter
  * than `n`).
  *
  * Motivation (SURVEY §7.4 tier (b), same reasoning as
  * [[HyperplaneBuckets]]): the column form built the B-share projection
  * as B+1 separate `filter`+`size` passes over a materialized gram
  * array, with one md5 + conv + substring evaluation per gram — O(L*B)
  * work and the largest single hotspot in the text-query bench at B=16,
  * and a B-branch Janino compile that cannot build at fastText-scale
  * bucket counts (2^18–2^21). This kernel is ONE pass over the UTF-8
  * bytes: code-point boundaries are found directly in the byte array
  * (UTF-8 continuation bytes are self-marking), each gram is md5'd as a
  * byte SLICE — no gram string, no gram array, no hex-string
  * intermediates — and counts land in a B-sized long array. O(L + B)
  * per row, constant compile cost at any B.
  *
  * Numeric contract: bucket = (first-k-hex-digits of md5(gram UTF-8
  * bytes) as an integer) % buckets — identical to
  * `conv(substring(md5(g), 1, k), 16, 10) % B` (and bit-identical to the
  * historical one-digit form at B <= 16); share = count/total in double
  * division, exactly the old `size(filter)/size` arithmetic. Buckets is
  * capped at 16^7 so the k-digit value fits a non-negative Int and the
  * share array stays allocatable.
  *
  * Null semantics: null text → null (callers that want the historical
  * "null text scores all-zero shares" coalesce to '' first — the empty
  * string has no grams, which lands in the same all-zero branch). */
case class GramBucketShares(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (first.dataType != StringType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_gram_bucket_shares requires a string text arg, got ${first.dataType.simpleString}")
    if (second.dataType != IntegerType || !second.foldable ||
        third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_gram_bucket_shares requires int literal (n, buckets) args")
    (second.eval(), third.eval()) match {
      case (n: Int, _) if n < 1 =>
        TypeCheckResult.TypeCheckFailure(s"gram size must be >= 1, got $n")
      case (_, b: Int) if b < 1 || b > GramBucketShares.MaxBuckets =>
        TypeCheckResult.TypeCheckFailure(
          s"buckets must be in [1, ${GramBucketShares.MaxBuckets}], got $b")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GramBucketShares =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def nullSafeEval(t: Any, n: Any, b: Any): Any =
    GramBucketShares.compute(t.asInstanceOf[UTF8String],
      n.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, b) => {
      // companion-object static forwarder, the HyperplaneBuckets.signs
      // pattern — the hot loop lives in ONE compiled method instead of
      // B-proportional generated code
      val cls = classOf[GramBucketShares].getName
      s"${ev.value} = $cls.compute($t, $n, $b);"
    })

  override def prettyName: String = "graft_gram_bucket_shares"
}

object GramBucketShares {
  /** 16^7 = 2^28: the largest bucket count whose k-hex-digit address
    * still fits a non-negative Int (and a sane share-array size). */
  val MaxBuckets: Int = 1 << 28

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Smallest k with 16^k >= buckets (min 1) — the hex-digit width of
    * the bucket address, mirrored by the SQL form's substring length. */
  def hexDigits(buckets: Int): Int = {
    var k = 1
    var cap = 16L
    while (cap < buckets) { k += 1; cap *= 16 }
    k
  }

  def compute(text: UTF8String, n: Int, buckets: Int): ArrayData = {
    val bytes = text.getBytes
    // code-point start offsets: UTF-8 continuation bytes are 10xxxxxx
    var cps = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) cps += 1
      i += 1
    }
    val starts = new Array[Int](cps + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(cps) = bytes.length
    val out = new Array[Double](buckets)
    val nGrams = cps - n + 1
    if (nGrams > 0) {
      val k = hexDigits(buckets)
      val counts = new Array[Long](buckets)
      val md = mdTL.get()
      var g = 0
      while (g < nGrams) {
        md.reset()
        md.update(bytes, starts(g), starts(g + n) - starts(g))
        val h = md.digest()
        var v = 0L
        var d = 0
        while (d < k) {
          val nib = if (d % 2 == 0) (h(d / 2) >> 4) & 0xf else h(d / 2) & 0xf
          v = v * 16 + nib
          d += 1
        }
        counts((v % buckets).toInt) += 1L
        g += 1
      }
      var j = 0
      while (j < buckets) {
        out(j) = counts(j).toDouble / nGrams.toDouble
        j += 1
      }
    }
    new GenericArrayData(out)
  }
}

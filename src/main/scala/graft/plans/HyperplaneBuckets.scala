package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native random-hyperplane LSH bucket assignment over an `array<float>`
  * embedding: bit j of the result long is the sign of dot(v, r_j), where
  * hyperplane component r_jd = ±1 from the parity of the first hex digit
  * of md5("j_d") — the same deterministic, model-free hash family as
  * [[graft.operators.Similarity.lshBuckets]]'s original column form.
  *
  * Motivation (SURVEY §7.4 tier (b)): the driver-unrolled column form
  * builds a `planes × dims × 2`-node expression tree (~1k Catalyst nodes
  * at 8×64). That tree costs seconds of analysis + Janino compilation,
  * and — because Spark's generated-class cache holds only 100 entries —
  * a multi-query workload evicts and RE-compiles it, which is exactly
  * what inflated `a_ann_lsh_topk` in the round-3 bench. This expression
  * is one codegen'd loop: constant compile cost, single pass over the
  * vector computing all plane dots at once.
  *
  * Numeric contract: identical to the unrolled form — each float widens
  * to double, multiplies by ±1.0 (exact), accumulates sequentially over
  * dimensions; bit j set iff dot > 0. Bit-identical buckets, so oracle
  * hashes are unchanged.
  *
  * Null semantics: null array → null; any null element → null result.
  * (The prior column form mapped null elements to bucket contributions of
  * 0 via `when(...).otherwise(0)`; embeddings are non-null by schema, and
  * poisoning is the safer contract for an index key — a vector with
  * missing dimensions must not silently land in a valid bucket.)
  */
case class HyperplaneBuckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (vecOk && right.dataType == IntegerType && right.foldable) {
      // planes is foldable, so its value is known at analysis time: range-
      // check it HERE — planes >= 64 would silently wrap `1L << j` (Java
      // shifts are mod 64, merging plane bits) and planes <= 0 would give
      // every row bucket 0, both wrong with no error at eval time.
      right.eval() match {
        case p: Int if p >= 1 && p <= 63 => TypeCheckResult.TypeCheckSuccess
        case p => TypeCheckResult.TypeCheckFailure(
          s"graft_hyperplane_bucket requires 1 <= planes <= 63, got $p")
      }
    } else TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bucket requires (array<float>, int literal), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneBuckets =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val planes = b.asInstanceOf[Int]
    val n = v.numElements()
    val s = HyperplaneBuckets.signs(planes, n)
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        dot += v.getFloat(i).toDouble * s(j * n + i)
        i += 1
      }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val hasNullElem = ctx.freshName("hasNullElem")
      // sign matrix cached across rows in generated-class state; dims is
      // constant per dataset so the guard re-fetches only on first row.
      val signs = ctx.addMutableState("double[]", "hyperplaneSigns")
      val signsDims = ctx.addMutableState("int", "hyperplaneSignsDims")
      val cls = classOf[HyperplaneBuckets].getName
      s"""
         |int $n = $a.numElements();
         |if ($signs == null || $signsDims != $n) {
         |  $signs = $cls.signs($p, $n);
         |  $signsDims = $n;
         |}
         |long $bucket = 0L;
         |boolean $hasNullElem = false;
         |for (int $j = 0; $j < $p && !$hasNullElem; $j++) {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { $hasNullElem = true; break; }
         |    $dot += ((double) $a.getFloat($i)) * $signs[$j * $n + $i];
         |  }
         |  if ($dot > 0) $bucket |= (1L << $j);
         |}
         |if ($hasNullElem) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })

  override def prettyName: String = "graft_hyperplane_bucket"
}

object HyperplaneBuckets {
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Flattened (planes × dims) sign matrix, row-major: entry (j, d) at
    * j*dims + d. sign(j, d) depends only on (j, d) — the parity of the
    * high nibble of md5("j_d") byte 0 — so both sides of any join build
    * identical planes with no stored model. Cached per (planes, dims). */
  def signs(planes: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((planes, dims), { key =>
      val (p, n) = key
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](p * n)
      var j = 0
      while (j < p) {
        var d = 0
        while (d < n) {
          val h = md.digest(s"${j}_$d".getBytes("UTF-8"))
          out(j * n + d) = if ((((h(0) >> 4) & 0xf) % 2) == 1) 1.0 else -1.0
          d += 1
        }
        j += 1
      }
      out
    })
}

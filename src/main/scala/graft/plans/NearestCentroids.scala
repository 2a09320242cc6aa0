package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StructType}

/** Native top-`n` nearest-centroid ids of an `array<float>` vector
  * against a FOLDABLE centroid-model literal
  * (`array<struct<_1:bigint, _2:array<float>>>`, sorted by cid — what
  * [[graft.operators.Vectors]]' `centroidsLit` builds): the coarse
  * assignment step of the whole ANN/k-means/SemDeDup family, as one
  * codegen'd loop.
  *
  * Motivation (SURVEY §7.4 tier (b), the [[HyperplaneBuckets]]
  * reasoning): the column form — `transform` + `graft_cosine` +
  * `array_max`/`sort_array` over the literal — is already a pure
  * projection (the round-7 rewrite killed the k×corpus Exchange), but
  * it pays a fresh multi-second Janino compile per query (the measured
  * 2.8 → 8.8 s ANN-family bench swing) and per-row struct/array churn.
  * This kernel is constant compile cost and zero per-row allocation
  * beyond the n-slot result.
  *
  * Numeric contract — bit-identical to the column form it replaces:
  * cosine per centroid exactly as [[CosineSimilarity]] (floats widen to
  * double, sequential left-to-right accumulation over min(len) dims),
  * rounded to 6 dp with SQL `round` semantics
  * (`BigDecimal.valueOf(d).setScale(6, HALF_UP)` — what Spark generates
  * for `round(double, 6)`); selection order (cosine desc, cid asc),
  * ties to the lowest cid. Returns min(n, k) ids.
  *
  * The model literal is decoded ONCE (per expression instance
  * interpreted; per generated-class instance in codegen — the literal
  * is that instance's plan constant, so the guard never decodes a stale
  * model). Null vector → null; null vector ELEMENT → null (the
  * graft_cosine poison contract). */
case class NearestCentroids(first: Expression, second: Expression, third: Expression,
                            zeroSafe: Boolean = false)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = second.foldable && (second.dataType match {
      case ArrayType(s: StructType, _) if s.fields.length == 2 =>
        s.fields(0).dataType == LongType &&
          (s.fields(1).dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          })
      case _ => false
    })
    if (!vecOk || !centsOk || third.dataType != IntegerType || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_nearest_centroids requires (array<float>, " +
          "array<struct<bigint,array<float>>> literal, int literal), got " +
          s"${first.dataType.simpleString} / ${second.dataType.simpleString} / " +
          s"${third.dataType.simpleString}")
    third.eval() match {
      case n: Int if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case n => TypeCheckResult.TypeCheckFailure(s"n must be >= 1, got $n")
    }
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCentroids =
    copy(first = newFirst, second = newSecond, third = newThird)

  @transient private lazy val model: NearestCentroids.Model =
    NearestCentroids.decode(second.eval().asInstanceOf[ArrayData])

  override def nullSafeEval(v: Any, cents: Any, n: Any): Any =
    NearestCentroids.topCids(v.asInstanceOf[ArrayData], model,
      n.asInstanceOf[Int], zeroSafe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents, n) => {
      val cls = classOf[NearestCentroids].getName
      val modelCls = classOf[NearestCentroids.Model].getName
      // decoded once per generated-class instance: the cents literal is
      // a plan constant of exactly that instance
      val m = ctx.addMutableState(modelCls, "ncModel")
      s"""
         |if ($m == null) $m = $cls.decode($cents);
         |${ev.value} = $cls.topCids($v, $m, $n, $zeroSafe);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })

  override def prettyName: String =
    if (zeroSafe) "graft_nearest_centroids_zs" else "graft_nearest_centroids"
}

object NearestCentroids {
  /** Decoded centroid model: parallel cid/vector arrays in literal
    * (= ascending cid) order. */
  final class Model(val cids: Array[Long], val vecs: Array[Array[Float]])

  def decode(cents: ArrayData): Model = {
    val k = cents.numElements()
    val cids = new Array[Long](k)
    val vecs = new Array[Array[Float]](k)
    var i = 0
    while (i < k) {
      val row = cents.getStruct(i, 2)
      cids(i) = row.getLong(0)
      vecs(i) = row.getArray(1).toFloatArray()
      i += 1
    }
    new Model(cids, vecs)
  }

  /** Top-n cids by (6-dp cosine desc, cid asc); null on a null vector
    * element (the graft_cosine poison contract). `zeroSafe` switches to
    * the PQ family's contract: a zero-norm side scores exactly 0.0
    * (tested on the sqrt(na)*sqrt(nb) product, the same expression the
    * column form's `cosineSafe` compares to 0.0) instead of NaN. */
  def topCids(v: ArrayData, m: Model, n: Int, zeroSafe: Boolean = false): ArrayData = {
    val k = m.cids.length
    val vn = v.numElements()
    val vd = new Array[Double](vn)
    var i = 0
    while (i < vn) {
      if (v.isNullAt(i)) return null
      vd(i) = v.getFloat(i).toDouble
      i += 1
    }
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = m.vecs(c)
      val len = math.min(vn, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      i = 0
      while (i < len) {
        val xv = vd(i)
        val yv = cv(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val prod = math.sqrt(na) * math.sqrt(nb)
      val cos = dot / prod
      // SQL round(double, 6): shortest-decimal BigDecimal, HALF_UP, with
      // NaN/Infinity passed through — exactly what Spark's RoundBase
      // does for the column form's round(…, 6) (BigDecimal.valueOf
      // would throw on the non-finite cases a zero-norm vector yields)
      scores(c) =
        if (zeroSafe && prod == 0.0) 0.0
        else if (java.lang.Double.isNaN(cos) || java.lang.Double.isInfinite(cos)) cos
        else java.math.BigDecimal.valueOf(cos)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      c += 1
    }
    val out = new Array[Long](math.min(n, k))
    val used = new Array[Boolean](k)
    var r = 0
    while (r < out.length) {
      var best = -1
      c = 0
      while (c < k) {
        // SQL double ordering (the column form's struct array_max /
        // sort_array): NaN greatest, -0.0 == 0.0; ties break to the
        // LOWEST cid explicitly, so the contract holds even for a model
        // literal that is not cid-sorted
        if (!used(c)) {
          val d = if (best < 0) 1 else cmpSql(scores(c), scores(best))
          if (d > 0 || (d == 0 && m.cids(c) < m.cids(best))) best = c
        }
        c += 1
      }
      used(best) = true
      out(r) = m.cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Spark SQL double comparison: equal-first check collapses
    * -0.0 == 0.0; Double.compare puts NaN above everything. */
  private def cmpSql(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)
}

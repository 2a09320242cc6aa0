package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` columns, with whole-stage codegen (`doGenCode`).
  *
  * Motivation (SURVEY §7.4 tier (b)): the composable form —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_) / (sqrt(...) * sqrt(...))` —
  * materializes an intermediate product array per row pair and evaluates
  * three separate higher-order folds. This expression fuses dot product
  * and both norms into ONE loop with no allocation, which is the hot path
  * of every ANN/near-dup operator (millions of pairs at bench scale).
  *
  * Numeric contract: floats widen to double before multiply (exact);
  * accumulation is sequential left-to-right — bit-identical to the
  * composable form it replaces, so oracle hashes are unchanged.
  *
  * Null semantics match the HOF composition: null array → null; any null
  * ELEMENT → null result (zip_with product null poisons the fold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires two array<float> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      // freshName is mandatory for EVERY local: two graft_cosine calls fused
      // into one whole-stage-codegen method would otherwise redeclare the
      // variable, fail Janino compilation, and silently drop the stage to
      // interpreted execution.
      val hasNullElem = ctx.freshName("hasNullElem")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |boolean $hasNullElem = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNullElem = true; break; }
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if ($hasNullElem) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override def prettyName: String = "graft_cosine"
}

/** Session registration for graft's native expressions — either through
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * or imperatively via [[GraftFunctions.register]] (idempotent; operators
  * call it before using `graft_cosine`). */
object GraftFunctions {
  val cosineInfo = new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine")
  val intersectInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count")
  val hyperplaneInfo = new ExpressionInfo(
    classOf[HyperplaneBuckets].getName, "graft_hyperplane_bucket")
  val gramSharesInfo = new ExpressionInfo(
    classOf[GramBucketShares].getName, "graft_gram_bucket_shares")
  val nearestCentroidsInfo = new ExpressionInfo(
    classOf[NearestCentroids].getName, "graft_nearest_centroids")
  val nearestCentroidsZsInfo = new ExpressionInfo(
    classOf[NearestCentroids].getName, "graft_nearest_centroids_zs")
  val hilbertInfo = new ExpressionInfo(classOf[HilbertKey].getName, "graft_hilbert_key")
  val jaroWinklerInfo = new ExpressionInfo(
    classOf[JaroWinklerSimilarity].getName, "graft_jaro_winkler")
  val bpeTokenCountInfo = new ExpressionInfo(
    classOf[BpeTokenCount].getName, "graft_bpe_token_count")
  val minhashSignatureInfo = new ExpressionInfo(
    classOf[MinhashSignature].getName, "graft_minhash_signature")
  val simhashInfo = new ExpressionInfo(
    classOf[SimhashFingerprint].getName, "graft_simhash")
  val shingleHashSetInfo = new ExpressionInfo(
    classOf[ShingleHashSet].getName, "graft_shingle_hash_set")
  val winnowFpsInfo = new ExpressionInfo(
    classOf[WinnowFingerprints].getName, "graft_winnow_fps")
  val md5PrefixLongInfo = new ExpressionInfo(
    classOf[Md5PrefixLong].getName, "graft_md5_prefix_long")
  val kmPositionsInfo = new ExpressionInfo(
    classOf[KmPositions].getName, "graft_km_positions")
  val charEntropyPartsInfo = new ExpressionInfo(
    classOf[CharEntropyParts].getName, "graft_char_entropy_parts")
  val bpeTokenSumInfo = new ExpressionInfo(
    classOf[BpeTokenSum].getName, "graft_bpe_token_sum")

  private val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_cosine"), cosineInfo,
      (c: Seq[Expression]) => CosineSimilarity(c.head, c(1))),
    (FunctionIdentifier("graft_sorted_intersect_count"), intersectInfo,
      (c: Seq[Expression]) => SortedIntersectCount(c.head, c(1))),
    (FunctionIdentifier("graft_hyperplane_bucket"), hyperplaneInfo,
      (c: Seq[Expression]) => HyperplaneBuckets(c.head, c(1))),
    (FunctionIdentifier("graft_gram_bucket_shares"), gramSharesInfo,
      (c: Seq[Expression]) => GramBucketShares(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_nearest_centroids"), nearestCentroidsInfo,
      (c: Seq[Expression]) => NearestCentroids(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_nearest_centroids_zs"), nearestCentroidsZsInfo,
      (c: Seq[Expression]) => NearestCentroids(c.head, c(1), c(2), zeroSafe = true)),
    (FunctionIdentifier("graft_hilbert_key"), hilbertInfo,
      (c: Seq[Expression]) => HilbertKey(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_jaro_winkler"), jaroWinklerInfo,
      (c: Seq[Expression]) => JaroWinklerSimilarity(c.head, c(1))),
    (FunctionIdentifier("graft_bpe_token_count"), bpeTokenCountInfo,
      (c: Seq[Expression]) => BpeTokenCount(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_minhash_signature"), minhashSignatureInfo,
      (c: Seq[Expression]) => MinhashSignature(c.head, c(1))),
    (FunctionIdentifier("graft_simhash"), simhashInfo,
      (c: Seq[Expression]) => SimhashFingerprint(c.head, c(1))),
    (FunctionIdentifier("graft_shingle_hash_set"), shingleHashSetInfo,
      (c: Seq[Expression]) => ShingleHashSet(c.head, c(1))),
    (FunctionIdentifier("graft_winnow_fps"), winnowFpsInfo,
      (c: Seq[Expression]) => WinnowFingerprints(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_md5_prefix_long"), md5PrefixLongInfo,
      (c: Seq[Expression]) => Md5PrefixLong(c.head, c(1))),
    (FunctionIdentifier("graft_km_positions"), kmPositionsInfo,
      (c: Seq[Expression]) => KmPositions(c.head, c(1), c(2))),
    (FunctionIdentifier("graft_char_entropy_parts"), charEntropyPartsInfo,
      (c: Seq[Expression]) => CharEntropyParts(c.head)),
    (FunctionIdentifier("graft_bpe_token_sum"), bpeTokenSumInfo,
      (c: Seq[Expression]) => BpeTokenSum(c.head, c(1), c(2))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (id, info, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, b)
    }

  private[plans] def all = builders
}

/** `SparkSessionExtensions` hook: inject the native functions at session
  * build time (`--conf spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Vectors

/** Generative equivalence tests for the three native Catalyst kernels:
  * each must agree with the composable column form it replaced, on
  * arbitrary inputs (seed-pinned sampling — no scalatestplus bridge in
  * the offline cache). This is the guarantee that lets operators swap
  * the kernels in without changing any oracle result. */
class NativeKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 30).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN && !f.isInfinite)

  private val vecPairGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(1, 64)
    a <- Gen.listOfN(n, finiteFloat)
    b <- Gen.listOfN(n, finiteFloat)
  } yield (a.toArray, b.toArray)

  private val sortedArraysGen: Gen[(Array[String], Array[String])] = for {
    na <- Gen.choose(0, 40)
    nb <- Gen.choose(0, 40)
    a <- Gen.listOfN(na, Gen.choose(0, 30).map(i => s"s$i"))
    b <- Gen.listOfN(nb, Gen.choose(0, 30).map(i => s"s$i"))
  } yield (a.distinct.sorted.toArray, b.distinct.sorted.toArray)

  test("graft_cosine equals the HOF composition on arbitrary vectors") {
    GraftFunctions.register(spark)
    forAll(vecPairGen) { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(Vectors.cosine(col("a"), col("b")).as("hof"),
          Vectors.cosineNative(spark, col("a"), col("b")).as("native"))
        .as[(Double, Double)].head()
      assert(java.lang.Double.doubleToLongBits(r._1) ===
        java.lang.Double.doubleToLongBits(r._2))
    }
  }

  test("graft_sorted_intersect_count equals size(array_intersect) on arbitrary sorted sets") {
    GraftFunctions.register(spark)
    forAll(sortedArraysGen) { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(
          size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"),
          call_function("graft_sorted_intersect_count", col("a"), col("b")).as("native"))
        .as[(Long, Long)].head()
      assert(r._1 === r._2)
      assert(r._2 === a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("graft_sorted_intersect_count: long-element variant equals set intersection") {
    GraftFunctions.register(spark)
    val longPairGen: Gen[(Array[Long], Array[Long])] = for {
      na <- Gen.choose(0, 40)
      nb <- Gen.choose(0, 40)
      a <- Gen.listOfN(na, Gen.choose(-50L, 50L))
      b <- Gen.listOfN(nb, Gen.choose(-50L, 50L))
    } yield (a.distinct.sorted.toArray, b.distinct.sorted.toArray)
    forAll(longPairGen) { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_sorted_intersect_count", col("a"), col("b")))
        .as[Long].head()
      assert(r === a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("graft_hyperplane_bucket equals the unrolled projection on arbitrary vectors") {
    GraftFunctions.register(spark)
    forAll(vecPairGen) { case (v, _) =>
      val planes = 8
      val s = HyperplaneBuckets.signs(planes, v.length)
      val unrolled = (0 until planes).map { p =>
        val dot = (1 to v.length).map { d1 =>
          element_at(col("v"), d1).cast("double") * lit(s(p * v.length + d1 - 1))
        }.reduce(_ + _)
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      val r = Seq(Tuple1(v)).toDF("v")
        .select(unrolled.as("unrolled"),
          call_function("graft_hyperplane_bucket", col("v"), lit(planes)).as("native"))
        .as[(Long, Long)].head()
      assert(r._1 === r._2)
    }
  }
}

package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generative hardening for round-10 primitives: the floor-division hour
  * bucket (both sides of the epoch) and stable-id assignment (equal to
  * the global rank on arbitrary data, including heavy order-key ties). */
class Round10PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 20).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  test("hourBucket floors exactly like Math.floorDiv across the epoch") {
    // micros spanning 1902..2106, dense around the epoch and hour edges
    val microsGen: Gen[Long] = Gen.oneOf(
      Gen.chooseNum(-3_600_000_000L * 4, 3_600_000_000L * 4),
      Gen.chooseNum(-2_000_000_000_000_000L, 4_000_000_000_000_000L),
      Gen.oneOf(0L, -1L, 1L, 3_600_000_000L, -3_600_000_000L,
        3_599_999_999L, -3_599_999_999L))
    forAll(Gen.listOfN(50, microsGen)) { micros =>
      val got = micros.toDF("us")
        .select(expr("timestamp_micros(us)").as("ts"), col("us"))
        .select(col("us"), graft.streaming.EventStream.hourBucket("ts").as("hr"))
        .as[(Long, Long)].collect().toMap.map(identity)
      micros.foreach { us =>
        assert(got(us) === Math.floorDiv(us, 3_600_000_000L),
          s"us=$us")
      }
    }
  }

  test("StableIds.assign equals the global rank under the total order, with ties") {
    val rowsGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 200)
      // key space of 5 values -> heavy ties; doc ids unique
      keys <- Gen.listOfN(n, Gen.choose(0L, 4L))
    } yield keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
    forAll(rowsGen) { rows =>
      val df = rows.toDF("doc_id", "k")
      val got = StableIds.assign(df, Seq(col("k"), col("doc_id")))
        .select("doc_id", "stable_id").as[(Long, Long)].collect().toMap
      val want = rows.sortBy { case (id, k) => (k, id) }
        .zipWithIndex.map { case ((id, _), r) => id -> r.toLong }.toMap
      assert(got === want)
    }
  }
}

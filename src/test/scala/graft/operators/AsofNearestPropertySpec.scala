package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Generative hardening for the round-11 asofJoinNearest rewrite: on
  * arbitrary keyed event sets — duplicate timestamps, null value
  * columns, keys with no right rows — the one-pass union-sort operator
  * must equal a brute-force per-left-row reference that scans every
  * right row and picks by (|Δt|, side, tie) exactly as the q_asof_nearest
  * oracle's LATERAL does. */
class AsofNearestPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 15).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private case class R(k: Long, ts: Long, eid: Long, v: Option[String])

  test("asofJoinNearest equals the brute-force (|dt|, side, event_id) pick on arbitrary data") {
    val rowGen: Gen[R] = for {
      k <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 30L) // small range -> frequent duplicate ts
      eid <- Gen.choose(1L, 1000L)
      v <- Gen.option(Gen.alphaStr.map(_.take(3)))
    } yield R(k, ts, eid, v)
    val setGen = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 40)
      left <- Gen.listOfN(nl, rowGen)
      right <- Gen.listOfN(nr, rowGen)
    } yield (left, right)

    forAll(setGen) { case (left0, right0) =>
      // unique left ids; dedupe right on (k, ts, eid) so the tie order is
      // a total order (the operator's documented requirement)
      val left = left0.zipWithIndex.map { case (r, i) => r.copy(eid = i.toLong) }
      val right = right0.groupBy(r => (r.k, r.ts, r.eid)).values.map(_.head).toSeq
      val lDf = left.map(r => (r.k, r.ts, r.eid)).toDF("k", "ts", "lid")
      val rDf = right.map(r => (r.k, r.ts, r.eid, r.v)).toDF("k", "ts", "event_id", "v")
      val got = AsofJoin.asofJoinNearest(lDf, rDf, Seq("k"), "ts", "ts",
          rightValueCols = Seq("ts", "event_id", "v"),
          rightTieCols = Seq("event_id"))
        .orderBy("lid")
        .select("lid", "nearest_ts", "nearest_event_id", "nearest_v")
        .collect()
        .map(r => (r.getAs[Long]("lid"),
          Option(r.getAs[java.lang.Long]("nearest_ts")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("nearest_event_id")).map(_.longValue),
          Option(r.getAs[String]("nearest_v"))))

      val expected = left.sortBy(_.eid).map { l =>
        val cands = right.filter(_.k == l.k)
        if (cands.isEmpty) (l.eid, None, None, None)
        else {
          val best = cands.minBy { c =>
            val dt = math.abs(c.ts - l.ts)
            val side = if (c.ts <= l.ts) 0 else 1
            (dt, side, c.eid)
          }
          (l.eid, Some(best.ts), Some(best.eid), best.v)
        }
      }
      assert(got.toSeq === expected,
        s"left=$left right=$right")
    }
  }

  test("fixedQuerySample is invariant to partitioning and row order") {
    val rowsGen = for {
      n <- Gen.choose(0, 120)
      ids <- Gen.listOfN(n, Gen.choose(0L, 5000L))
    } yield ids.distinct
    forAll(rowsGen) { ids =>
      val base = ids.map(i => (i, s"p$i")).toDF("vec_id", "payload")
      val a = Similarity.fixedQuerySample(base, "vec_id")
        .select("vec_id").as[Long].collect().toSeq
      val b = Similarity.fixedQuerySample(
          base.repartition(7, col("payload")).sortWithinPartitions(desc("vec_id")),
          "vec_id")
        .select("vec_id").as[Long].collect().toSeq
      assert(a === b, s"ids=$ids")
      // the sample is the md5-order prefix of the id set — verify against
      // a driver-side reference
      val md = java.security.MessageDigest.getInstance("MD5")
      def h(x: Long) = md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val ref = ids.sortBy(i => (h(i), i)).take(20)
      assert(a === ref)
    }
  }
}

package graft.fuzz

import graft.operators._

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The ddmin shrinker's contract (round-14 verdict item 8): the result
  * still fails, is no larger than the input, and for conjunction-of-k
  * failure causes lands on exactly the k culprit items within budget. */
class ShrinkSpec extends AnyFunSuite {

  test("shrinks a 2-item conjunction cause out of 50 items to exactly those 2") {
    val items = (1 to 50).toVector
    var evals = 0
    val fails = (s: Seq[Int]) => { evals += 1; s.contains(17) && s.contains(42) }
    val min = Shrink.ddmin(items, fails)
    assert(min.toSet === Set(17, 42))
    assert(evals <= 120)
  }

  test("single-culprit cause shrinks to 1 item; result always still fails") {
    val r = new Random(7L)
    for (_ <- 0 until 20) {
      val n = 5 + r.nextInt(60)
      val culprit = 1 + r.nextInt(n)
      val items = (1 to n).toVector
      val fails = (s: Seq[Int]) => s.contains(culprit)
      val min = Shrink.ddmin(items, fails)
      assert(min === Vector(culprit))
    }
  }

  test("budget exhaustion still returns a failing subset (never a passing one)") {
    val items = (1 to 200).toVector
    val need = Set(3, 77, 150)
    val fails = (s: Seq[Int]) => need.subsetOf(s.toSet)
    val min = Shrink.ddmin(items, fails, maxEvals = 10)
    assert(fails(min), "shrink result must still reproduce the failure")
    assert(min.size <= items.size)
  }
}

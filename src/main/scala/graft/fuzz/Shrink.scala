package graft.fuzz

import graft.operators._

/** Delta-debugging minimizer for fuzz divergences (round-14 verdict
  * item 8, the stretch): when a differential run diverges, the raw
  * repro is a 12–50 item corpus/embedding set — the r14 `ceilSafe`
  * catch took a manual bisect from a 50-doc corpus. [[ddmin]] (Zeller &
  * Hildebrandt 2002, "Simplifying and Isolating Failure-Inducing
  * Input") shrinks the item set to a 1-minimal failing subset before it
  * is recorded, so the next catch ships self-explaining.
  *
  * The predicate receives a candidate subset and answers "does the
  * divergence still reproduce?" — the fuzz runners wrap `runOne` with
  * exceptions counted as failures (a crash is also a repro). Evaluation
  * count is bounded: each predicate call replays a full Spark
  * differential, so the budget caps shrink cost at a known multiple of
  * one fuzz case. */
object Shrink {

  /** Classic ddmin over `items`: returns a subset that still fails, at
    * most `maxEvals` predicate evaluations (returns the best-so-far on
    * budget exhaustion). `fails(items)` must be true on entry. */
  def ddmin[A](items: Seq[A], fails: Seq[A] => Boolean,
               maxEvals: Int = 120): Seq[A] = {
    var evals = 0
    def check(s: Seq[A]): Boolean = {
      if (evals >= maxEvals) false
      else { evals += 1; fails(s) }
    }
    var cur = items.toVector
    var n = 2
    while (cur.size >= 2 && n <= cur.size && evals < maxEvals) {
      val chunkSize = math.max(1, (cur.size + n - 1) / n)
      val chunks = cur.grouped(chunkSize).toVector
      // reduce to a single failing chunk…
      chunks.find(c => c.size < cur.size && check(c)) match {
        case Some(c) =>
          cur = c; n = 2
        case None =>
          // …or to a failing complement (one chunk removed)
          chunks.indices.map(i =>
            chunks.patch(i, Nil, 1).flatten).find(cpl =>
            cpl.size < cur.size && cpl.nonEmpty && check(cpl)) match {
            case Some(cpl) =>
              cur = cpl; n = math.max(2, n - 1)
            case None =>
              if (n >= cur.size) n = cur.size + 1 // done
              else n = math.min(cur.size, n * 2)
          }
      }
    }
    cur
  }
}

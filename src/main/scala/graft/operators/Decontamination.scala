package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Benchmark decontamination: flag training documents whose k-shingle
  * sets overlap an evaluation/benchmark set — the standard pre-training
  * hygiene step (n-gram overlap against held-out benchmarks) that keeps
  * test data out of the training corpus.
  *
  * Scale shape: the evaluation side of the join is benchmark data —
  * KBs-to-MBs even for large eval suites — so its distinct shingle set is
  * explicitly `broadcast()`: the overlap check is a MAP-SIDE hash join
  * against the corpus shingle stream, no shuffle of the 100 TB side. The
  * per-doc contamination aggregate is the only corpus shuffle, keyed by
  * doc id (narrow: one row per contaminated doc).
  */
object Decontamination {

  /** Per-document contamination report against the rows matching
    * `evalPred` (the benchmark subset). Returns training docs (rows NOT
    * matching `evalPred`) whose fraction of distinct k-shingles shared
    * with ANY benchmark doc reaches `minFrac`:
    * (id, n_contaminated, n_shingles, contamination).
    *
    * Cache lifetime: the internal shingle frame is `cache()`d (three join
    * branches consume it) and, like [[Dedup.hashedShingleSets]], lives
    * until session end — the bench harness clears caches between queries;
    * a long-lived pipeline should `spark.catalog.clearCache()` (or scope
    * a session) once the returned frame is materialized. */
  def flagContaminated(df0: DataFrame, idCol: String, textCol: String,
                       evalPred: Column, k: Int = 3,
                       minFrac: Double = 0.05): DataFrame = {
    val df = Dedup.widen(df0)
    // 8-byte hashed shingles (see Dedup.shingleHash): the overlap join
    // keys and the broadcast eval set carry longs, not shingle strings
    // cached: three branches consume sh (eval set, per-doc totals, and
    // the overlap join) and none share an exchange — uncached, the
    // tokenize→shingle→hash pipeline would run three times
    val sh = df.select(col(idCol), evalPred.as("is_eval"),
        tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col(idCol), col("is_eval"),
        explode(array_distinct(transform(
          shingles(col("toks"), k), Dedup.shingleHash(_)))).as("s"))
      .cache()
    val evalSh = broadcast(sh.filter(col("is_eval")).select("s").distinct())
    val train = sh.filter(!col("is_eval"))
    // shingles() emits DISTINCT shingles per doc, so count(*) counts the
    // doc's distinct shingles (total) and its distinct contaminated ones.
    val n = train.groupBy(col(idCol)).agg(count(lit(1)).as("n_shingles"))
    val bad = train.join(evalSh, "s")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    bad.join(n, idCol)
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
      .filter(col("contamination") >= minFrac)
      .select(idCol, "n_contaminated", "n_shingles", "contamination")
  }
}

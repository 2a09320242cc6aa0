package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog

/** Round-9 analytics tier: interval algebra, distribution tests, corpus
  * growth laws, and reshaping operators over the driver tables — the
  * statistics a 100 TB training-data curation run reports alongside the
  * dedup/sampling stages (distribution drift between sources, corpus
  * vocabulary saturation, coverage of event activity).
  *
  * Same determinism contract as [[PipelineQueries]]: integer/decimal
  * arithmetic end-to-end, logs rounded to 9 dp before decimal summation,
  * final ratios rounded to 6 dp — every entry hash-matches its DuckDB
  * oracle at any parallelism.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(s, dir, name)
  private def docs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Interval union (merge-overlaps) per user: events become
    //     activity intervals [ts, ts + 60·value seconds]; the classic
    //     sweep — running max of interval ends spots island boundaries
    //     (start beyond every previous end), islands aggregate to
    //     (count, exact covered micros). The window is PARTITIONED BY
    //     user, so the sweep distributes; per-key work is bounded by
    //     that user's event count (contrast the day-partitioned global
    //     sweep in CoreQueries.peakConcurrency). All arithmetic is
    //     int64 epoch-micros — no float anywhere. ---
    "q_interval_union" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val iv = t(s, dir, "events").select(
        col("user_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) +
          floor(col("value") * 60).cast("long") * 1000000L).as("e"))
      val wPrev = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      iv.withColumn("pmax", max(col("e")).over(wPrev))
        .withColumn("ns",
          when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
        .withColumn("island", sum(col("ns")).over(wRun))
        .groupBy("user_id", "island")
        .agg(min(col("s")).as("is0"), max(col("e")).as("ie1"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie1") - col("is0")).as("covered_us"))
        .orderBy("user_id")
    }),

    // --- Unpivot (wide→long melt): per-returnflag measure columns back
    //     to (measure, value) rows — Spark's native `unpivot` (the
    //     inverse of q_pivot). Map-side reshape: no shuffle beyond the
    //     feeding aggregate. ---
    "q_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("l_discount").cast("decimal(18,6)")).cast("double").as("sum_disc"))
      wide.unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // --- Two-sample Kolmogorov–Smirnov statistic between the length
    //     distributions of two sources (the distribution-drift test the
    //     rank-sum entry complements: KS is sensitive to shape, not
    //     just location). D = max |F1−F2| computed EXACTLY: per-length
    //     counts, cumulative integer sums, and the sup taken over the
    //     integer cross-difference c1·n2 − c2·n1 — one float division
    //     at the very end. The global window runs over DISTINCT
    //     lengths (a pre-aggregated, bounded domain), not rows. ---
    "t_ks_test" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir).filter(col("source").isin("src0", "src1"))
      val byLen = d.groupBy("n_chars").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c2"))
      val w = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byLen.select(
        sum(col("c1")).over(w).as("f1"), sum(col("c2")).over(w).as("f2"))
      val tot = d.agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n2"))
      cum.crossJoin(tot)
        .groupBy("n1", "n2")
        .agg(max(abs(col("f1") * col("n2") - col("f2") * col("n1"))).as("dnum"))
        .select(col("n1"), col("n2"),
          round(col("dnum").cast("double") / (col("n1") * col("n2")), 6).as("ks_d"))
    }),

    // --- Simpson diversity of the language mix per source: unbiased
    //     λ = Σ nᵢ(nᵢ−1) / N(N−1) plus its inverse (effective number
    //     of languages) — the "is this source monolingual?" audit
    //     statistic. Exact integer numerator/denominator, one rounded
    //     division each. ---
    "t_simpson_diversity" -> ((s, dir) =>
      docs(s, dir)
        .groupBy("source", "lang").agg(count(lit(1)).as("ni"))
        .groupBy("source").agg(
          count(lit(1)).as("n_langs"),
          sum(col("ni") * (col("ni") - 1)).as("num"),
          sum(col("ni")).as("n"))
        .select(col("source"), col("n_langs"),
          when(col("n") > 1,
            round(col("num").cast("double") / (col("n") * (col("n") - 1)), 6))
            .as("simpson"),
          when(col("num") > 0,
            round((col("n") * (col("n") - 1)).cast("double") / col("num"), 6))
            .as("effective_langs"))
        .orderBy("source")),

    // --- Heaps'-law fit per source: vocabulary growth V(N) ≈ K·N^β
    //     over doc_id-ordered prefixes — β near 0.5 is natural text;
    //     β collapsing toward 0 flags a templated/repetitive source
    //     whose vocabulary saturates. New-type counts come from a
    //     first-occurrence aggregate (min doc_id per type), prefix
    //     sums from a per-source window over ONE ROW PER DOC (never
    //     per token), and β is the same rounded-log decimal OLS as
    //     t_zipf_slope. ---
    "t_heaps_law" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.TextFunctions._
      val tok = graft.functions.SafeExplode.explodeSelect(
        docs(s, dir).select(col("doc_id"), col("source"),
          tokens(col("text")).as("toks")),
        Seq(col("doc_id"), col("source")), col("toks"), "token")
      val perDoc = tok.groupBy("source", "doc_id").agg(count(lit(1)).as("n_tok"))
      val newTypes = tok.groupBy("source", "token").agg(min("doc_id").as("doc_id"))
        .groupBy("source", "doc_id").agg(count(lit(1)).as("n_new"))
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pref = perDoc.join(newTypes, Seq("source", "doc_id"), "left")
        .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
        .select(col("source"),
          sum(col("n_tok")).over(w).as("cn"), sum(col("n_new")).over(w).as("cv"))
        .filter(col("cn") >= 1 && col("cv") >= 1)
        .select(col("source"),
          round(log(col("cn").cast("double")), 9).as("x"),
          round(log(col("cv").cast("double")), 9).as("y"))
      val means = pref.groupBy("source").agg(
        (sum(col("x").cast("decimal(28,9)")).cast("double") / count(lit(1))).as("xbar"),
        (sum(col("y").cast("decimal(28,9)")).cast("double") / count(lit(1))).as("ybar"))
      pref.join(means, "source").groupBy("source").agg(
          sum(round((col("x") - col("xbar")) * (col("y") - col("ybar")), 9)
            .cast("decimal(28,9)")).cast("double").as("sxy"),
          sum(round((col("x") - col("xbar")) * (col("x") - col("xbar")), 9)
            .cast("decimal(28,9)")).cast("double").as("sxx"))
        .select(col("source"), round(col("sxy") / col("sxx"), 6).as("heaps_beta"))
        .orderBy("source")
    })
  )

  private val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"

  val oracleSql: Map[String, String] = Map(
    "q_interval_union" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(floor(value * 60) AS BIGINT) * 1000000 AS e
        |  FROM events),
        |m AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
        |g AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS ns FROM m),
        |i AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM g),
        |isl AS (SELECT user_id, island, min(s) AS is0, max(e) AS ie1
        |        FROM i GROUP BY user_id, island)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(ie1 - is0) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
        |ORDER BY l_returnflag, measure""".stripMargin,
    "t_ks_test" ->
      """WITH d AS (SELECT source, n_chars FROM documents
        |           WHERE source IN ('src0', 'src1')),
        |bl AS (SELECT n_chars,
        |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c2
        |  FROM d GROUP BY n_chars),
        |cum AS (SELECT
        |    sum(c1) OVER w AS f1, sum(c2) OVER w AS f2 FROM bl
        |  WINDOW w AS (ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM d)
        |SELECT n1, n2,
        |  round(CAST(max(abs(f1 * n2 - f2 * n1)) AS DOUBLE) / (n1 * n2), 6) AS ks_d
        |FROM cum CROSS JOIN tot GROUP BY n1, n2""".stripMargin,
    "t_simpson_diversity" ->
      """WITH cl AS (SELECT source, lang, count(*) AS ni
        |            FROM documents GROUP BY source, lang),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |    CAST(sum(ni * (ni - 1)) AS BIGINT) AS num,
        |    CAST(sum(ni) AS BIGINT) AS n
        |  FROM cl GROUP BY source)
        |SELECT source, n_langs,
        |  CASE WHEN n > 1 THEN round(num::DOUBLE / (n * (n - 1)), 6) END AS simpson,
        |  CASE WHEN num > 0 THEN round((n * (n - 1))::DOUBLE / num, 6) END AS effective_langs
        |FROM a ORDER BY source""".stripMargin,
    "t_heaps_law" ->
      s"""WITH tok AS (SELECT doc_id, source, unnest($toks) AS token FROM documents),
         |pd AS (SELECT source, doc_id, count(*) AS n_tok FROM tok GROUP BY source, doc_id),
         |fo AS (SELECT source, token, min(doc_id) AS doc_id FROM tok GROUP BY source, token),
         |nt AS (SELECT source, doc_id, count(*) AS n_new FROM fo GROUP BY source, doc_id),
         |pref AS (SELECT source,
         |    sum(n_tok) OVER w AS cn, sum(coalesce(n_new, 0)) OVER w AS cv
         |  FROM pd LEFT JOIN nt USING (source, doc_id)
         |  WINDOW w AS (PARTITION BY source ORDER BY doc_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |v AS (SELECT source, round(ln(cn::DOUBLE), 9) AS x, round(ln(cv::DOUBLE), 9) AS y
         |      FROM pref WHERE cn >= 1 AND cv >= 1),
         |means AS (SELECT source,
         |    CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS xbar,
         |    CAST(sum(CAST(y AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS ybar
         |  FROM v GROUP BY source)
         |SELECT source, round(
         |  CAST(sum(CAST(round((x - xbar) * (y - ybar), 9) AS DECIMAL(28,9))) AS DOUBLE) /
         |  CAST(sum(CAST(round((x - xbar) * (x - xbar), 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS heaps_beta
         |FROM v JOIN means USING (source) GROUP BY source ORDER BY source""".stripMargin
  )
}

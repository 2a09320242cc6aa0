package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog

/** Round-9 time-series / distribution-statistics tier: the monitoring
  * mathematics a 100 TB ingest runs over its OWN telemetry — seasonality
  * and autocorrelation of arrival volumes, nonparametric trend tests,
  * planner-grade equi-depth histograms, correlation matrices, survival
  * curves of user activity, and privacy-preserving reporting.
  *
  * Scale shape shared by every entry here: the corpus-sized pass is a
  * single pre-aggregation to a MODEL-SIZED frame (days, buckets, tie
  * groups — thousands of rows at any corpus size), and all the
  * statistical algebra runs over that small frame. At 1000 executors the
  * cost is one map-side-combined aggregate; the windows/self-joins below
  * never touch raw rows.
  *
  * Same determinism contract as [[PipelineQueries]]: integer or decimal
  * arithmetic until a final float step whose expression shape is
  * identical in both engines (ln only ever takes an INTEGER argument,
  * 9-dp rounding before decimal accumulation, 6-dp final rounding).
  */
object StatQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(s, dir, name)

  /** Daily event totals — the shared pre-aggregate of the series tier.
    * `dayN` is the epoch-day INTEGER (date arithmetic via plain int64
    * subtraction is engine-proof; named weekday functions disagree on
    * 0-vs-1-based and week-start conventions across engines). */
  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("day_n"))
      .agg(count(lit(1)).as("cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- Autocorrelation function of daily volume at lags 1..7: the
    //     "is load periodic?" number behind capacity planning and
    //     anomaly baselines (a weekly cycle shows as a lag-7 peak).
    //     Pearson r over (x_t, x_{t+l}) pairs with EXACT integer
    //     moment sums (counts are int64; n·Σxy − Σx·Σy never leaves
    //     integer land) and one sqrt/division at the end. The lag
    //     fan-out is a 7-row literal cross join against the day-grain
    //     frame — never against raw events. ---
    "q_acf" -> ((s, dir) => {
      val d = daily(s, dir)
      val lags = s.range(1, 8).select(col("id").as("lag"))
      d.as("a").crossJoin(lags)
        .join(d.as("b"), col("b.day_n") === col("a.day_n") + col("lag"))
        .groupBy("lag")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.cnt")).as("sx"), sum(col("b.cnt")).as("sy"),
          sum(col("a.cnt") * col("b.cnt")).as("sxy"),
          sum(col("a.cnt") * col("a.cnt")).as("sxx"),
          sum(col("b.cnt") * col("b.cnt")).as("syy"))
        .select(col("lag"), col("n_pairs"),
          when(
            (col("n_pairs") * col("sxx") - col("sx") * col("sx")) > 0 &&
              (col("n_pairs") * col("syy") - col("sy") * col("sy")) > 0,
            round(
              (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt(((col("n_pairs") * col("sxx") - col("sx") * col("sx")) *
                  (col("n_pairs") * col("syy") - col("sy") * col("sy"))).cast("double")),
              6)).as("acf"))
        .orderBy("lag")
    }),

    // --- Classical seasonal decomposition of daily volume:
    //     trend = centered 7-day moving average (full windows only),
    //     seasonal = per-weekday mean of the detrended series,
    //     residual = observed − trend − seasonal. The alerting
    //     decomposition: a residual spike is real news even when raw
    //     volume is inside its weekly swing. Weekday = day_n mod 7
    //     (pure integer — see `daily`). Detrended values stay exact
    //     rationals with denominator 7 (7x − Σwindow), so the seasonal
    //     mean is Σ integers / (7n); trend/residual take one double
    //     division each with identical shape in both engines. ---
    "q_seasonal_decomp" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("day_n").rowsBetween(-3, 3)
      val wd = daily(s, dir)
        .withColumn("wsum", sum(col("cnt")).over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .filter(col("wn") === 7)
        .withColumn("weekday", pmod(col("day_n"), lit(7L)))
      val seasonal = wd.groupBy("weekday")
        .agg(sum(lit(7L) * col("cnt") - col("wsum")).as("snum"),
          (count(lit(1)) * 7L).as("sden"))
        .select(col("weekday"),
          round(col("snum").cast("double") / col("sden"), 6).as("seasonal"))
      wd.join(seasonal, "weekday")
        .select(col("day_n"), col("cnt"),
          round(col("wsum").cast("double") / 7.0, 6).as("trend"),
          col("seasonal"),
          round(col("cnt").cast("double") - col("wsum").cast("double") / 7.0 -
            col("seasonal"), 6).as("residual"))
        .orderBy("day_n")
    }),

    // --- Mann–Kendall trend test per event type: the nonparametric
    //     "is volume drifting?" screen (no linearity or normality
    //     assumption — complements the OLS slope and CUSUM entries).
    //     S = Σ_{i<j} sign(x_j − x_i) over the day-grain series with
    //     the tie-corrected variance
    //     Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 and the
    //     continuity-corrected z. Every quantity up to the final
    //     division is an int64; the pairwise join runs over the
    //     day-grain frame (≤ a few thousand rows per type at ANY
    //     corpus size), never over events. ---
    "q_mann_kendall" -> ((s, dir) => {
      val d = t(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day_n"))
        .agg(count(lit(1)).as("cnt"))
      val sStat = d.as("a")
        .join(d.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.day_n") < col("b.day_n"))
        .groupBy(col("a.event_type").as("event_type"))
        .agg(sum(signum(col("b.cnt") - col("a.cnt")).cast("long")).as("s"))
      val nDays = d.groupBy("event_type").agg(count(lit(1)).as("n"))
      val ties = d.groupBy("event_type", "cnt").agg(count(lit(1)).as("tie"))
        .groupBy("event_type")
        .agg(sum(col("tie") * (col("tie") - 1) * (lit(2L) * col("tie") + 5)).as("tsum"))
      sStat.join(nDays, "event_type").join(ties, "event_type")
        .withColumn("varnum",
          col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) - col("tsum"))
        .select(col("event_type"), col("s"), col("n"), col("varnum"),
          when(col("varnum") > 0,
            round(
              when(col("s") > 0, (col("s") - 1).cast("double"))
                .when(col("s") < 0, (col("s") + 1).cast("double"))
                .otherwise(lit(0.0)) /
                sqrt(col("varnum").cast("double") / 18.0), 6)).as("mk_z"))
        .orderBy("event_type")
    }),

    // --- Equi-depth histogram of order totals: 8 equal-frequency
    //     buckets with exact boundaries and counts — what an
    //     optimizer's column statistics actually store (equi-WIDTH
    //     histograms lie under skew; equi-depth boundaries are the
    //     selectivity-estimation primitive). ntile over a FULLY
    //     tie-broken order (value, key) is deterministic in both
    //     engines; one shuffle on the window order. ---
    "q_equidepth_hist" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "orders")
        .withColumn("bucket",
          ntile(8).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")
    }),

    // --- Pearson correlation matrix over the lineitem measures: the
    //     multicollinearity screen run before any of these columns
    //     becomes a model feature or a CUPED covariate. ONE pass
    //     computes every moment (Σx, Σx², Σxy for all 4 columns = 14
    //     decimal-exact sums, map-side combined); the 6 pairwise r
    //     values are algebra over that single row, melted to
    //     (col_a, col_b, r). Inputs are 2-dp-scale currency/ratio
    //     values, so DECIMAL(14,2) casts make every product and sum
    //     EXACT; the only float steps are the final decimal→double
    //     conversions and one identically-shaped formula. ---
    "q_corr_matrix" -> ((s, dir) => {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val dec = cols.map(c => col(c).cast("decimal(14,2)").as(c))
      val li = t(s, dir, "lineitem").select(dec: _*)
      val sums =
        Seq(count(lit(1)).as("n")) ++
          cols.map(c => sum(col(c)).as(s"s_$c")) ++
          (for (a <- cols; b <- cols if a <= b)
            yield sum(col(a) * col(b)).as(s"p_${a}_$b"))
      val m = li.agg(sums.head, sums.tail: _*)
      def r(a: String, b: String) = {
        val (x, y) = if (a <= b) (a, b) else (b, a)
        val num = col("n").cast("double") * col(s"p_${x}_$y").cast("double") -
          col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
        val dx = col("n").cast("double") * col(s"p_${a}_$a").cast("double") -
          col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
        val dy = col("n").cast("double") * col(s"p_${b}_$b").cast("double") -
          col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
        when(dx > 0 && dy > 0, round(num / sqrt(dx * dy), 6))
      }
      val pairs = (for (i <- cols.indices; j <- cols.indices if i < j)
        yield { val (a, b) = (cols(i), cols(j)); if (a <= b) (a, b) else (b, a) }).sorted
      pairs.map { case (a, b) =>
        m.select(lit(a).as("col_a"), lit(b).as("col_b"), r(a, b).as("r"))
      }.reduce(_ unionAll _).orderBy("col_a", "col_b")
    }),

    // --- Modal value per group with a deterministic tiebreak: the
    //     MODE() aggregate (most common order priority per market
    //     segment) — engines disagree on which mode survives a tie,
    //     so the tiebreak (lowest value) is explicit. Two keyed
    //     aggregates + a WindowGroupLimit-pruned rank over the tiny
    //     (segment × priority) frame. ---
    "q_mode" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val counts = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
      counts.withColumn("rk",
          row_number().over(Window.partitionBy("c_mktsegment")
            .orderBy(col("cnt").desc, col("o_orderpriority"))))
        .filter(col("rk") === 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
          col("cnt").as("mode_count"))
        .orderBy("c_mktsegment")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_acf" ->
      """WITH d AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_n,
        |    count(*) AS cnt FROM events GROUP BY 1),
        |lags AS (SELECT CAST(unnest([1,2,3,4,5,6,7]) AS BIGINT) AS lag),
        |p AS (SELECT lag, a.cnt AS x, b.cnt AS y
        |  FROM d a CROSS JOIN lags JOIN d b ON b.day_n = a.day_n + lag),
        |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM p GROUP BY lag)
        |SELECT lag, n_pairs,
        |  CASE WHEN n_pairs*sxx - sx*sx > 0 AND n_pairs*syy - sy*sy > 0 THEN
        |    round(CAST(n_pairs*sxy - sx*sy AS DOUBLE) /
        |      sqrt(CAST((n_pairs*sxx - sx*sx) * (n_pairs*syy - sy*sy) AS DOUBLE)), 6)
        |  END AS acf
        |FROM m ORDER BY lag""".stripMargin,
    "q_seasonal_decomp" ->
      """WITH d AS (SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_n,
        |    count(*) AS cnt FROM events GROUP BY 1),
        |w AS (SELECT day_n, cnt,
        |    sum(cnt) OVER win AS wsum, count(*) OVER win AS wn
        |  FROM d WINDOW win AS (ORDER BY day_n ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT *, day_n % 7 AS weekday FROM w WHERE wn = 7),
        |se AS (SELECT weekday,
        |    round(CAST(sum(7*cnt - wsum) AS DOUBLE) / (count(*) * 7), 6) AS seasonal
        |  FROM f GROUP BY weekday)
        |SELECT day_n, cnt, round(CAST(wsum AS DOUBLE) / 7.0, 6) AS trend, seasonal,
        |  round(CAST(cnt AS DOUBLE) - CAST(wsum AS DOUBLE) / 7.0 - seasonal, 6) AS residual
        |FROM f JOIN se USING (weekday) ORDER BY day_n""".stripMargin,
    "q_mann_kendall" ->
      """WITH d AS (SELECT event_type,
        |    CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_n,
        |    count(*) AS cnt FROM events GROUP BY 1, 2),
        |s AS (SELECT a.event_type, CAST(sum(sign(b.cnt - a.cnt)) AS BIGINT) AS s
        |  FROM d a JOIN d b ON a.event_type = b.event_type AND a.day_n < b.day_n
        |  GROUP BY a.event_type),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY event_type),
        |tg AS (SELECT event_type, cnt, count(*) AS tie FROM d GROUP BY event_type, cnt),
        |tt AS (SELECT event_type,
        |    CAST(sum(tie * (tie - 1) * (2*tie + 5)) AS BIGINT) AS tsum
        |  FROM tg GROUP BY event_type),
        |v AS (SELECT event_type, s, n, n*(n-1)*(2*n+5) - tsum AS varnum
        |  FROM s JOIN n USING (event_type) JOIN tt USING (event_type))
        |SELECT event_type, s, n, varnum,
        |  CASE WHEN varnum > 0 THEN round(
        |    (CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
        |          WHEN s < 0 THEN CAST(s + 1 AS DOUBLE) ELSE 0.0 END) /
        |    sqrt(CAST(varnum AS DOUBLE) / 18.0), 6) END AS mk_z
        |FROM v ORDER BY event_type""".stripMargin,
    "q_equidepth_hist" ->
      """WITH b AS (SELECT o_totalprice,
        |    ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket FROM orders)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_corr_matrix" ->
      """WITH li AS (SELECT CAST(l_quantity AS DECIMAL(14,2)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(14,2)) AS e,
        |    CAST(l_discount AS DECIMAL(14,2)) AS d,
        |    CAST(l_tax AS DECIMAL(14,2)) AS t FROM lineitem),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(e) AS DOUBLE) AS se,
        |    CAST(sum(d) AS DOUBLE) AS sd, CAST(sum(t) AS DOUBLE) AS st,
        |    CAST(sum(q*q) AS DOUBLE) AS pqq, CAST(sum(q*e) AS DOUBLE) AS pqe,
        |    CAST(sum(q*d) AS DOUBLE) AS pqd, CAST(sum(q*t) AS DOUBLE) AS pqt,
        |    CAST(sum(e*e) AS DOUBLE) AS pee, CAST(sum(e*d) AS DOUBLE) AS ped,
        |    CAST(sum(e*t) AS DOUBLE) AS pet, CAST(sum(d*d) AS DOUBLE) AS pdd,
        |    CAST(sum(d*t) AS DOUBLE) AS pdt, CAST(sum(t*t) AS DOUBLE) AS ptt
        |  FROM li)
        |SELECT col_a, col_b,
        |  CASE WHEN n*paa - sa*sa > 0 AND n*pbb - sb*sb > 0 THEN
        |    round((n*pab - sa*sb) / sqrt((n*paa - sa*sa) * (n*pbb - sb*sb)), 6)
        |  END AS r
        |FROM (
        |  SELECT 'l_discount' AS col_a, 'l_extendedprice' AS col_b,
        |    sd AS sa, se AS sb, pdd AS paa, pee AS pbb, ped AS pab, n FROM m
        |  UNION ALL SELECT 'l_discount', 'l_quantity', sd, sq, pdd, pqq, pqd, n FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax', sd, st, pdd, ptt, pdt, n FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_quantity', se, sq, pee, pqq, pqe, n FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', se, st, pee, ptt, pet, n FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax', sq, st, pqq, ptt, pqt, n FROM m)
        |ORDER BY col_a, col_b""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_orderpriority),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY cnt DESC, o_orderpriority) AS rk FROM c)
        |SELECT c_mktsegment, o_orderpriority AS mode_priority,
        |  CAST(cnt AS BIGINT) AS mode_count
        |FROM r WHERE rk = 1 ORDER BY c_mktsegment""".stripMargin
  )
}

package graft.sql

import scala.util.Random

/** Seeded differential-SQL fuzz generator (round-12 verdict item 5):
  * random query shapes over the fixture schema, each a single ANSI SQL
  * string that runs UNCHANGED on both Spark and DuckDB — the
  * `DummyGenericRecordGenerator` discipline
  * (reference `src/test/java/.../DummyGenericRecordGenerator.java:61-66`)
  * applied to queries instead of records. The harness (graft.Fuzz) runs
  * each on Spark and dumps the same layout as graft.Verify, so
  * tools/check.py hash-compares the two engines row-for-row.
  *
  * Dialect envelope (why these queries can be engine-portable at all —
  * the repo's determinism contract, memory: graft-determinism-contract):
  *   - double aggregation goes through DECIMAL accumulation and a final
  *     6-dp round (order-independent, engine-exact);
  *   - integer sums are CAST to BIGINT (DuckDB widens to HUGEINT);
  *   - every ORDER BY ends in a unique-key tiebreak, and grouping-null
  *     producers (ROLLUP) pin NULLS FIRST (engine defaults differ);
  *   - temporal expressions (round-13 families) stay on the shared
  *     grain surface: date_trunc grains day..year, EXTRACT fields
  *     YEAR/QUARTER/MONTH/DAY/DOY/HOUR/MINUTE (SECOND is fractional
  *     DECIMAL(8,6) in Spark vs integer in DuckDB; DOW numbering
  *     differs — both excluded), `INTERVAL <n> <unit>` literals, and
  *     every temporal OUTPUT column is CAST to DATE or BIGINT so no
  *     raw timestamp encoding crosses the parquet seam;
  *   - division by data values (round-13 families) is ALWAYS guarded
  *     `x / nullif(y, 0)`: Spark 4 runs ANSI mode where raw x/0 is a
  *     runtime error while DuckDB yields NULL — the guard makes both
  *     engines produce NULL rows (probed by planted zero denominators).
  *     Quotients are compared either via `floor` (exact on identical
  *     IEEE bits — the form used whenever the denominator is a data
  *     value) or 6-dp round restricted to small-integer denominators.
  *     The round rests on (a) bit-identical IEEE quotients in both
  *     engines and (b) the engines' round() agreeing on those bits —
  *     probed empirically (~5M fixture-like value/denominator
  *     combinations, zero divergences). A divergence would need the
  *     quotient double's SHORTEST decimal repr to terminate in a
  *     7th-place 5 (Spark rounds the shortest repr HALF_UP, DuckDB the
  *     actual value), which small-integer-denominator quotients
  *     essentially never produce — but it is an empirical pin, not an
  *     identity: widening denominators or changing the round scale
  *     re-opens the question (re-probe before trusting it);
  *   - multi-column DISTINCT uses `a || '|' || b` (engine-portable;
  *     `concat` ignores NULLs in DuckDB but not Spark — excluded).
  */
object SqlFuzz {

  private case class Col(name: String)

  /** table -> (unique order key(s), group-able cols, double cols, bigint cols) */
  private case class Table(name: String, keys: Seq[String],
                           groups: Seq[String], doubles: Seq[String],
                           bigints: Seq[String])

  private val tables = Vector(
    Table("nation", Seq("n_nationkey"), Seq("n_regionkey"), Nil, Nil),
    Table("customer", Seq("c_custkey"), Seq("c_nationkey", "c_mktsegment"),
      Seq("c_acctbal"), Nil),
    Table("supplier", Seq("s_suppkey"), Seq("s_nationkey"), Seq("s_acctbal"), Nil),
    Table("part", Seq("p_partkey"), Seq("p_brand", "p_type", "p_size"),
      Seq("p_retailprice"), Nil),
    Table("orders", Seq("o_orderkey"), Seq("o_orderstatus", "o_orderpriority"),
      Seq("o_totalprice"), Nil),
    Table("lineitem", Seq("l_orderkey", "l_linenumber"),
      Seq("l_returnflag", "l_linestatus", "l_suppkey"),
      Seq("l_quantity", "l_extendedprice", "l_discount"), Nil),
    Table("events", Seq("event_id"), Seq("event_type", "user_id"),
      Seq("value"), Nil),
    Table("documents", Seq("doc_id"), Seq("lang", "source"), Nil, Seq("n_chars")))

  /** (left, right, join condition, right-side group col) — real FKs, so
    * inner and left joins agree on the fixture (every FK resolves). */
  private val fks = Vector(
    ("nation", "region", "nation.n_regionkey = region.r_regionkey", "r_name"),
    ("customer", "nation", "customer.c_nationkey = nation.n_nationkey", "n_name"),
    ("supplier", "nation", "supplier.s_nationkey = nation.n_nationkey", "n_name"),
    ("orders", "customer", "orders.o_custkey = customer.c_custkey", "c_mktsegment"),
    ("lineitem", "orders", "lineitem.l_orderkey = orders.o_orderkey", "o_orderpriority"),
    ("lineitem", "part", "lineitem.l_partkey = part.p_partkey", "p_brand"),
    ("lineitem", "supplier", "lineitem.l_suppkey = supplier.s_suppkey", "s_nationkey"))

  /** type-compatible column pairs for set operations */
  private val setPairs = Vector(
    ("SELECT c_nationkey AS k FROM customer", "SELECT n_nationkey AS k FROM nation"),
    ("SELECT s_nationkey AS k FROM supplier", "SELECT n_nationkey AS k FROM nation"),
    ("SELECT lang AS k FROM documents", "SELECT source AS k FROM documents"),
    ("SELECT o_custkey AS k FROM orders", "SELECT c_custkey AS k FROM customer"),
    ("SELECT l_suppkey AS k FROM lineitem", "SELECT s_suppkey AS k FROM supplier"))

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** String-typed group columns only: keys/ids and p_size are integers,
    * and int-vs-varchar coercion (coalesce, nullif, IS DISTINCT FROM) is
    * a dialect divergence the envelope deliberately excludes. */
  private def isStrGroup(g: String): Boolean =
    !g.endsWith("key") && !g.endsWith("id") && g != "p_size"

  /** decimal-accumulated, 6-dp-rounded double sum (engine-exact) */
  private def dsum(c: String) =
    s"round(CAST(sum(CAST($c AS DECIMAL(28,6))) AS DOUBLE), 6)"

  /** deterministic row predicate on a unique integer key */
  private def modPred(r: Random, key: String): String = {
    val m = pick(r, Seq(2, 3, 5, 7))
    val v = r.nextInt(m)
    s"$key % $m = $v"
  }

  private def aggSelect(r: Random, t: Table): String = {
    val aggs = scala.collection.mutable.ArrayBuffer(
      "CAST(count(*) AS BIGINT) AS cnt")
    if (t.doubles.nonEmpty) {
      val d = pick(r, t.doubles)
      aggs += s"${dsum(d)} AS sum_d"
      if (r.nextBoolean()) aggs += s"min($d) AS min_d"
      if (r.nextBoolean()) aggs += s"max($d) AS max_d"
    }
    for (b <- t.bigints.headOption if r.nextBoolean())
      aggs += s"CAST(sum($b) AS BIGINT) AS sum_b"
    if (r.nextBoolean())
      aggs += s"CAST(count(DISTINCT ${pick(r, t.keys)}) AS BIGINT) AS n_keys"
    aggs.mkString(", ")
  }

  /** three-table FK chains: (t1, t2, t3, on1, on2, group col) */
  private val chains = Vector(
    ("lineitem", "orders", "customer",
      "lineitem.l_orderkey = orders.o_orderkey",
      "orders.o_custkey = customer.c_custkey", "c_mktsegment"),
    ("lineitem", "supplier", "nation",
      "lineitem.l_suppkey = supplier.s_suppkey",
      "supplier.s_nationkey = nation.n_nationkey", "n_name"),
    ("orders", "customer", "nation",
      "orders.o_custkey = customer.c_custkey",
      "customer.c_nationkey = nation.n_nationkey", "n_name"))

  private def genOne(r: Random): String = r.nextInt(29) match {
    case 0 => // single-table group aggregate
      val t = pick(r, tables)
      val g = pick(r, t.groups)
      val aggs = aggSelect(r, t)
      val where = if (r.nextBoolean()) s"\nWHERE ${modPred(r, t.keys.head)}" else ""
      s"SELECT $g, $aggs FROM ${t.name}$where\nGROUP BY $g ORDER BY $g"
    case 1 => // FK join + group on the right side
      val (l, rt, on, g) = pick(r, fks)
      val lt = tables.find(_.name == l).get
      val join = if (r.nextBoolean()) "JOIN" else "LEFT JOIN"
      val aggs = "CAST(count(*) AS BIGINT) AS cnt" +
        (if (lt.doubles.nonEmpty) s", ${dsum(pick(r, lt.doubles))} AS sum_d" else "")
      val where = if (r.nextBoolean()) s"\nWHERE ${modPred(r, l + "." + lt.keys.head)}" else ""
      s"SELECT $g, $aggs FROM $l $join $rt ON $on$where\nGROUP BY $g ORDER BY $g NULLS FIRST"
    case 2 => // window: per-group top-n by a measure
      val t = pick(r, tables.filter(x => x.doubles.nonEmpty || x.bigints.nonEmpty))
      val g = pick(r, t.groups)
      val v = pick(r, t.doubles ++ t.bigints)
      val k = t.keys.mkString(", ")
      val n = 2 + r.nextInt(3)
      s"""SELECT $g, $k, $v, rn FROM (
         |  SELECT $g, $k, $v,
         |    CAST(row_number() OVER (PARTITION BY $g ORDER BY $v DESC, $k) AS BIGINT) AS rn
         |  FROM ${t.name}) ranked
         |WHERE rn <= $n ORDER BY $g, rn""".stripMargin
    case 3 => // set operation
      val (a, b) = pick(r, setPairs)
      val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
      s"$a\n$op\n$b\nORDER BY 1"
    case 4 => // order-limit (deterministic: unique-key tiebreak)
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val v = pick(r, t.doubles)
      val k = t.keys.mkString(", ")
      val dir = if (r.nextBoolean()) "DESC" else "ASC"
      // NULLS LAST pinned: under LIMIT the engines' default null order
      // (Spark ASC=NULLS FIRST, DuckDB=NULLS LAST) would select different
      // row SETS if a measure were ever null — the one template family
      // check.py's row re-sort cannot neutralize
      s"SELECT $k, $v FROM ${t.name} ORDER BY $v $dir NULLS LAST, $k LIMIT ${5 + r.nextInt(20)}"
    case 5 => // scalar expressions over a key scan
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val v = pick(r, t.doubles)
      val k = t.keys.head
      val lit = (r.nextInt(100) + 1).toString + ".5"
      val (c1, c2) = (r.nextInt(9) + 1, r.nextInt(100))
      // ORDER BY every key column: t.keys.head alone is not a total
      // order on lineitem's composite (and non-unique) key, and the
      // output columns depend on data values — the module contract is
      // that every ORDER BY is total up to output-equivalent ties
      s"""SELECT $k, CASE WHEN $v >= $lit THEN 'hi' ELSE 'lo' END AS band,
         |  round($v * $c1 + $c2, 6) AS y
         |FROM ${t.name} WHERE ${modPred(r, k)} ORDER BY ${t.keys.mkString(", ")}, y""".stripMargin
    case 6 => // HAVING
      val t = pick(r, tables)
      val g = pick(r, t.groups)
      s"""SELECT $g, CAST(count(*) AS BIGINT) AS cnt FROM ${t.name}
         |GROUP BY $g HAVING count(*) >= ${2 + r.nextInt(4)} ORDER BY $g""".stripMargin
    case 7 => // EXISTS / NOT EXISTS correlated subquery
      val neg = if (r.nextBoolean()) "NOT " else ""
      val lit = (r.nextInt(40) + 1) * 5000
      s"""SELECT c_custkey FROM customer c
         |WHERE ${neg}EXISTS (SELECT 1 FROM orders o
         |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $lit)
         |ORDER BY c_custkey""".stripMargin
    case 8 => // ROLLUP with pinned null ordering
      val t = pick(r, tables.filter(_.groups.size >= 2))
      val Seq(g1, g2) = r.shuffle(t.groups.toList).take(2).toSeq
      s"""SELECT $g1, $g2, CAST(count(*) AS BIGINT) AS cnt FROM ${t.name}
         |GROUP BY ROLLUP($g1, $g2)
         |ORDER BY $g1 NULLS FIRST, $g2 NULLS FIRST, cnt""".stripMargin
    case 9 => // correlated scalar-count subquery
      val (child, parent, on, _) = pick(r, fks.filter(_._2 != "region"))
      val pt = tables.find(_.name == parent).get
      val pk = pt.keys.head
      val ck = on.split(" = ")(0)
      s"""SELECT $pk, (SELECT CAST(count(*) AS BIGINT) FROM $child
         |  WHERE $ck = $parent.$pk) AS n_child
         |FROM $parent ORDER BY $pk""".stripMargin
    case 10 => // three-table FK join chain
      val (t1, t2, t3, on1, on2, g) = pick(r, chains)
      val lt = tables.find(_.name == t1).get
      val agg = if (lt.doubles.nonEmpty) s", ${dsum(pick(r, lt.doubles))} AS sum_d" else ""
      s"""SELECT $g, CAST(count(*) AS BIGINT) AS cnt$agg
         |FROM $t1 JOIN $t2 ON $on1 JOIN $t3 ON $on2
         |GROUP BY $g ORDER BY $g""".stripMargin
    case 11 => // FILTER-clause aggregates
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val g = pick(r, t.groups)
      val v = pick(r, t.doubles)
      val lit = (r.nextInt(50) + 1).toString
      s"""SELECT $g, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(count(*) FILTER (WHERE $v > $lit) AS BIGINT) AS n_over,
         |  ${dsum(v)} AS sum_d
         |FROM ${t.name} GROUP BY $g ORDER BY $g""".stripMargin
    case 12 => // IN / NOT IN subquery on an FK domain
      val neg = if (r.nextBoolean()) "NOT " else ""
      val lit = r.nextInt(5)
      s"""SELECT c_custkey, c_nationkey FROM customer
         |WHERE c_nationkey ${neg}IN
         |  (SELECT n_nationkey FROM nation WHERE n_regionkey = $lit)
         |ORDER BY c_custkey""".stripMargin
    case 13 => // GROUPING SETS with pinned null ordering
      val t = pick(r, tables.filter(_.groups.size >= 2))
      val Seq(g1, g2) = r.shuffle(t.groups.toList).take(2).toSeq
      s"""SELECT $g1, $g2, CAST(count(*) AS BIGINT) AS cnt FROM ${t.name}
         |GROUP BY GROUPING SETS (($g1), ($g2), ())
         |ORDER BY $g1 NULLS FIRST, $g2 NULLS FIRST, cnt""".stripMargin
    case 14 => // string scalar functions over a key scan
      val t = pick(r, Vector("customer", "supplier", "part", "documents"))
      val (k, c) = t match {
        case "customer" => ("c_custkey", "c_name")
        case "supplier" => ("s_suppkey", "s_name")
        case "part" => ("p_partkey", "p_name")
        case _ => ("doc_id", "source")
      }
      val off = r.nextInt(3) + 1
      val len = r.nextInt(6) + 2
      s"""SELECT $k, upper($c) AS u, CAST(length($c) AS BIGINT) AS n,
         |  substring($c, $off, $len) AS sub,
         |  replace($c, 'a', '_') AS rep
         |FROM $t WHERE ${modPred(r, k)} ORDER BY $k""".stripMargin
    case 15 => // COALESCE / NULLIF over group strings (null-fixture teeth)
      // The nullif probe compares TWO DISTINCT columns (the self-compare
      // form was a tautology — NULL for null, empty, and non-null alike —
      // and could never catch a divergence). ORDER pins the full key
      // list plus the output columns (lineitem's keys are composite and
      // non-unique; ties must be output-equivalent).
      val t = pick(r, tables.filter(_.groups.count(isStrGroup) >= 2))
      val Seq(g1, g2) = r.shuffle(t.groups.filter(isStrGroup).toList).take(2).toSeq
      val k = t.keys.head
      s"""SELECT $k, coalesce($g1, 'missing') AS c1,
         |  nullif($g1, $g2) AS nf,
         |  ($g1 = $g2) IS NULL AS cmp_null
         |FROM ${t.name} WHERE ${modPred(r, k)}
         |ORDER BY ${t.keys.mkString(", ")}, c1 NULLS FIRST, nf NULLS FIRST, cmp_null""".stripMargin
    case 16 => // LIKE / NOT LIKE predicate
      val (t, k, c) = pick(r, Vector(
        ("customer", "c_custkey", "c_name"), ("supplier", "s_suppkey", "s_name"),
        ("part", "p_partkey", "p_name"), ("documents", "doc_id", "lang")))
      val neg = if (r.nextBoolean()) "NOT " else ""
      val pat = pick(r, Vector("%0%", "%1", "%a%", "%e%", "_%2%"))
      s"""SELECT $k, $c FROM $t
         |WHERE $c ${neg}LIKE '$pat' ORDER BY $k""".stripMargin
    case 17 => // CTE + join back
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val g = pick(r, t.groups)
      val v = pick(r, t.doubles)
      s"""WITH agg AS (
         |  SELECT $g, ${dsum(v)} AS sum_d, CAST(count(*) AS BIGINT) AS cnt
         |  FROM ${t.name} GROUP BY $g)
         |SELECT a.$g, a.sum_d, a.cnt FROM agg a
         |WHERE a.cnt >= ${1 + r.nextInt(3)} ORDER BY a.$g NULLS FIRST""".stripMargin
    case 18 => // ROWS-frame running window (decimal-accumulated)
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val g = pick(r, t.groups)
      val v = pick(r, t.doubles)
      val k = t.keys.mkString(", ")
      val pre = 1 + r.nextInt(3)
      // the frame ORDER must be TOTAL up to rows interchangeable for the
      // running sum: the synthetic fixture's "keys" are NOT unique
      // (lineitem carries 11k+ duplicate (l_orderkey, l_linenumber)
      // pairs — found by this very template diverging), so the measure
      // joins the sort key (ties on (g, k, v) are frame-equivalent) and
      // its null position is pinned (engine defaults differ)
      s"""SELECT $g, $k,
         |  round(CAST(sum(CAST($v AS DECIMAL(28,6)))
         |    OVER (PARTITION BY $g ORDER BY $k, $v ASC NULLS LAST
         |          ROWS BETWEEN $pre PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS run_v
         |FROM ${t.name} ORDER BY $g NULLS FIRST, $k""".stripMargin
    case 19 => // integer arithmetic with explicit casts + greatest/least
      val t = pick(r, tables)
      val k = t.keys.head
      val (a, b, m) = (r.nextInt(7) + 1, r.nextInt(50), r.nextInt(9) + 2)
      s"""SELECT $k, CAST($k * $a + $b AS BIGINT) AS lin,
         |  CAST($k % $m AS BIGINT) AS md,
         |  CAST(greatest($k % $m, least($k % ${m + 3}, $a)) AS BIGINT) AS gl
         |FROM ${t.name} WHERE ${modPred(r, k)} ORDER BY $k""".stripMargin
    case 20 => // date_trunc grain group-agg (temporal output CAST to DATE)
      val grain = pick(r, Seq("day", "week", "month", "quarter", "year"))
      val (tbl, ts, key, v) = if (r.nextBoolean())
        ("events", "ts", "event_id", Some("value"))
      else ("orders", "o_orderdate", "o_orderkey", Some("o_totalprice"))
      val agg = v.map(d => s", ${dsum(d)} AS sum_d").getOrElse("")
      val where = if (r.nextBoolean()) s"\nWHERE ${modPred(r, key)}" else ""
      s"""SELECT CAST(date_trunc('$grain', $ts) AS DATE) AS bucket,
         |  CAST(count(*) AS BIGINT) AS cnt$agg
         |FROM $tbl$where
         |GROUP BY 1 ORDER BY bucket NULLS FIRST""".stripMargin
    case 21 => // EXTRACT fields (shared-grain surface; BIGINT-cast)
      val f = pick(r, Seq("YEAR", "QUARTER", "MONTH", "DAY", "DOY", "HOUR", "MINUTE"))
      if (r.nextBoolean()) // row-level over a key slice
        s"""SELECT event_id, CAST(EXTRACT($f FROM ts) AS BIGINT) AS ex,
           |  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h
           |FROM events WHERE ${modPred(r, "event_id")} ORDER BY event_id""".stripMargin
      else // grouped on the extracted grain
        s"""SELECT CAST(EXTRACT($f FROM ts) AS BIGINT) AS ex,
           |  CAST(count(*) AS BIGINT) AS cnt, ${dsum("value")} AS sum_d
           |FROM events GROUP BY 1 ORDER BY ex NULLS FIRST""".stripMargin
    case 22 => // interval arithmetic (shifted outputs CAST to DATE)
      val h = 1 + r.nextInt(72)
      val d = 1 + r.nextInt(30)
      s"""SELECT event_id, CAST(ts + INTERVAL $h HOUR AS DATE) AS fwd_d,
         |  CAST(ts - INTERVAL $d DAY AS DATE) AS back_d,
         |  CAST(EXTRACT(DAY FROM ts + INTERVAL $h HOUR) AS BIGINT) AS fwd_day
         |FROM events WHERE ${modPred(r, "event_id")} ORDER BY event_id""".stripMargin
    case 23 => // cross-grain comparison: timestamp vs DATE-literal bounds
      val a = 1 + r.nextInt(25)
      val k = 1 + r.nextInt(10)
      val lo = f"DATE '2024-01-$a%02d'"
      val hi = if (r.nextBoolean()) s"$lo + INTERVAL $k DAY"
               else f"TIMESTAMP '2024-01-${math.min(a + k, 31)}%02d 12:30:00'"
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
         |  ${dsum("value")} AS sum_d
         |FROM events WHERE ts >= $lo AND ts < $hi
         |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
    case 24 => // guarded row-level division (+ planted zero denominators)
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val v = pick(r, t.doubles)
      val k = t.keys.head
      val m = 2 + r.nextInt(7) // k % m is 0 on ~1/m of rows -> NULL ratio
      s"""SELECT $k,
         |  round(CAST($v AS DOUBLE) / nullif(CAST($k % $m AS DOUBLE), 0), 6) AS ratio_int,
         |  CAST(floor(CAST($k AS DOUBLE) / nullif(CAST($v AS DOUBLE), 0)) AS BIGINT) AS fl_data,
         |  CAST($k % $m AS BIGINT) = 0 AS was_zero
         |FROM ${t.name} WHERE ${modPred(r, k)}
         |ORDER BY ${t.keys.mkString(", ")}, ratio_int NULLS FIRST, fl_data NULLS FIRST""".stripMargin
    case 25 => // aggregate ratios: decimal-exact avg / ratio-of-sums (floored micros)
      // clamp before the BIGINT cast: signed columns (acctbal) can cancel a
      // denominator sum to ~0, and an unclamped quotient overflows the cast
      // (a runtime ERROR in both engines, differently). CASE preserves NULL
      // (greatest/least null-skip policies diverge across engines).
      def clampMicro(q: String): String =
        s"""CAST(floor(CASE WHEN $q > 1e15 THEN 1e15
           |    WHEN $q < -1e15 THEN -1e15 ELSE $q END) AS BIGINT)""".stripMargin
      val t = pick(r, tables.filter(_.doubles.nonEmpty))
      val g = pick(r, t.groups)
      val v = pick(r, t.doubles)
      val v2 = pick(r, t.doubles)
      val avgQ = s"""CAST(sum(CAST($v AS DECIMAL(28,6))) AS DOUBLE)
           |    / nullif(CAST(count($v) AS DOUBLE), 0) * 1000000.0""".stripMargin
      val ratioQ = s"""CAST(sum(CAST($v AS DECIMAL(28,6))) AS DOUBLE)
           |    / nullif(CAST(sum(CAST($v2 AS DECIMAL(28,6))) AS DOUBLE), 0) * 1000000.0""".stripMargin
      s"""SELECT $g,
         |  ${clampMicro(avgQ)} AS avg_micro,
         |  ${clampMicro(ratioQ)} AS ratio_micro,
         |  CAST(count(*) AS BIGINT) AS cnt
         |FROM ${t.name} GROUP BY $g ORDER BY $g NULLS FIRST""".stripMargin
    case 26 => // DISTINCT aggregates (multi-distinct forces Spark's Expand)
      val t = pick(r, tables.filter(_.groups.size >= 2))
      val Seq(g1, g2) = r.shuffle(t.groups.toList).take(2).toSeq
      val k = t.keys.head
      val sumDist = t.doubles.headOption.map(d =>
        s",\n  round(CAST(sum(DISTINCT CAST($d AS DECIMAL(28,6))) AS DOUBLE), 6) AS sum_dist").getOrElse("")
      s"""SELECT $g1, CAST(count(DISTINCT $g2) AS BIGINT) AS nd,
         |  CAST(count(DISTINCT $k % ${3 + r.nextInt(5)} || '|' || $g2) AS BIGINT) AS nd_pair,
         |  CAST(count(*) AS BIGINT) AS cnt$sumDist
         |FROM ${t.name} GROUP BY $g1 ORDER BY $g1 NULLS FIRST""".stripMargin
    case 27 => // FULL OUTER join with forced unmatched rows on both sides
      val (l, rt, on, g) = pick(r, fks)
      val lt = tables.find(_.name == l).get
      val lk = lt.keys.head
      val restrict = s"$l.$lk % ${2 + r.nextInt(4)} = ${r.nextInt(2)}"
      s"""SELECT $g, CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(count($l.$lk) AS BIGINT) AS n_left
         |FROM $l FULL JOIN $rt ON $on AND $restrict
         |GROUP BY $g ORDER BY $g NULLS FIRST, cnt""".stripMargin
    case 28 => // null-safe comparison: IS [NOT] DISTINCT FROM (3VL teeth —
      // on the null twin either operand can be NULL; probed identical in
      // both engines: NULL≡NULL true, 1≡NULL false)
      val t = pick(r, tables.filter(_.groups.count(isStrGroup) >= 2))
      val Seq(g1, g2) = r.shuffle(t.groups.filter(isStrGroup).toList).take(2).toSeq
      val k = t.keys.head
      if (r.nextBoolean())
        s"""SELECT $k, ($g1 IS NOT DISTINCT FROM $g2) AS ns_eq,
           |  ($g1 IS DISTINCT FROM $g2) AS ns_ne,
           |  CASE WHEN $g1 IS NOT DISTINCT FROM $g2 THEN 'same' ELSE 'diff' END AS tag
           |FROM ${t.name} WHERE ${modPred(r, k)}
           |ORDER BY ${t.keys.mkString(", ")}, ns_eq, tag""".stripMargin
      else
        s"""SELECT $g1, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(count(*) FILTER (WHERE $g1 IS NOT DISTINCT FROM $g2) AS BIGINT) AS n_nseq,
           |  CAST(count(*) FILTER (WHERE $g2 IS NULL) AS BIGINT) AS n_null2
           |FROM ${t.name} GROUP BY $g1 ORDER BY $g1 NULLS FIRST""".stripMargin
  }

  /** `n` named query shapes, fully determined by `seed` (same seed →
    * char-identical SQL — spec-pinned). */
  def queries(seed: Long, n: Int): Seq[(String, String)] = {
    val r = new Random(seed)
    (0 until n).map(i => (f"fuzz_q$i%03d", genOne(r)))
  }
}

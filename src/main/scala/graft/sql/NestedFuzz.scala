package graft.sql

import scala.util.Random

/** Nested/collection-type differential fuzz families (round-13 verdict
  * item 1): seeded random query shapes over the generated `nested`
  * fixture ([[graft.generate.NestedGen]]) plus the flat fixture tables,
  * exercising the query-side twin of the reference's nested row model —
  * explode/UNNEST + re-aggregate, array scalar functions, lambda HOFs,
  * struct field access and struct literals, map functions, LATERAL,
  * flatten, slice/distinct, and the string-function surface
  * (`RecordToStructConverter.java:214-216`, `AvroSchemaUtil.java:298-322`,
  * SURVEY §1.3).
  *
  * Unlike [[SqlFuzz]] (one ANSI string runs unchanged on both engines),
  * the nested surface is NOT name-portable: Spark says `size/explode/
  * transform/array_join/aggregate/slice/named_struct/try_element_at`,
  * DuckDB 1.0 says `len/unnest/list_transform/array_to_string/list_sum/
  * list_slice/struct_pack/element_at[1]`. Each template therefore
  * renders BOTH dialects from the SAME random parameters — a mechanical
  * bridge, pinned per function below — and the harness runs the Spark
  * text while the DuckDB text becomes the oracle.
  *
  * Dialect pins (probed on DuckDB 1.0.0 + Spark 4.1, recorded in
  * FIXTURES.md §nested-fuzz):
  *   - `filter(a, x -> p)`, `array_sort`, `array_contains`,
  *     `array_position`, `flatten`, `map_keys/values/entries`,
  *     `cardinality(map)`, `regexp_extract`, `split_part`,
  *     `position(x IN y)`, `levenshtein`, `translate`, `lpad`,
  *     `repeat`, `replace`, `instr`, `concat_ws` are NAME-PORTABLE.
  *   - null-element semantics DIVERGE for contains (Spark 3VL NULL vs
  *     DuckDB false when not-found-but-has-null), sort (Spark nulls
  *     LAST, DuckDB nulls FIRST), list_distinct (DuckDB DROPS nulls,
  *     Spark keeps one), flatten (Spark nulls the whole result on a
  *     null inner array, DuckDB skips it) — every template therefore
  *     null-guards: `coalesce(array_contains(..), false)`, and sorts/
  *     distincts/flattens only null-FILTERED arrays (`filter(a, x ->
  *     x IS NOT NULL)` is portable verbatim).
  *   - `array_distinct` result ORDER diverges (DuckDB hashes) — always
  *     re-sorted before fingerprinting.
  *   - slice args differ in kind: Spark slice(a, pos, LEN) vs DuckDB
  *     list_slice(a, pos, END-inclusive) — bridged numerically at
  *     generation time.
  *   - map value access: Spark 4 ANSI `m[k]`/`element_at` THROW on a
  *     missing key, so the bridge is `try_element_at(m, k)` vs DuckDB
  *     `element_at(m, k)[1]` (DuckDB returns a 0/1-element LIST; `[1]`
  *     of the empty list is NULL, matching try_element_at's miss).
  *   - every output column is scalar (BIGINT/STRING/BOOLEAN) — arrays
  *     are fingerprinted through sort+join — so tools/check.py's
  *     column compare stays exact.
  */
object NestedFuzz {

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.size))

  /** portable null-element filter (same text both dialects) */
  private def filtNN(a: String) = s"filter($a, x_ -> x_ IS NOT NULL)"

  /** Bridged array fingerprint: sort the null-filtered array, join.
    * Empty-array pin (found by this fuzzer's first sweep): Spark's
    * array_join([], sep) = '' but DuckDB's array_to_string([], sep) =
    * NULL — without the coalesce the empty-fingerprint group silently
    * merges into the null-array group on the DuckDB side. The CASE
    * keeps NULL inputs NULL (a2s can no longer distinguish them). */
  private def fp(a: String, sep: String): (String, String) =
    (s"array_join(array_sort(${filtNN(a)}), '$sep')",
     s"CASE WHEN ($a) IS NULL THEN NULL ELSE " +
       s"coalesce(array_to_string(array_sort(${filtNN(a)}), '$sep'), '') END")

  /** bridged element sum of a BIGINT array expression (caller guards
    * the NULL-array case — see the header pin). */
  private def asum(sparkArr: String, duckArr: String): (String, String) =
    (s"aggregate(${filtNN(sparkArr)}, CAST(0 AS BIGINT), (s_, x_) -> s_ + x_)",
     s"coalesce(list_sum(${filtNN(duckArr)}), 0)")

  private def size(a: String): (String, String) = (s"size($a)", s"len($a)")

  /** deterministic row predicate on the unique id */
  private def modPred(r: Random): String = {
    val m = pick(r, Seq(2, 3, 5, 7))
    s"id % $m = ${r.nextInt(m)}"
  }

  private def genOne(r: Random): (String, String) = r.nextInt(20) match {

    case 0 => // explode/UNNEST + re-aggregate (null elements group too)
      val arr = pick(r, Seq("arr_i", "arr_s"))
      val pred = modPred(r)
      def q(ex: String) =
        s"""SELECT x, CAST(count(*) AS BIGINT) AS cnt
           |FROM (SELECT $ex($arr) AS x FROM nested WHERE $pred) t
           |GROUP BY x ORDER BY x NULLS FIRST""".stripMargin
      (q("explode"), q("unnest"))

    case 1 => // array length histogram (size/len; NULL array -> NULL)
      val arr = pick(r, Seq("arr_i", "arr_s", "aa"))
      val (ss, sd) = size(arr)
      def q(sz: String) =
        s"""SELECT CAST($sz AS BIGINT) AS sz, CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(ss), q(sd))

    case 2 => // contains + position (name-portable; 3VL guarded)
      val v = r.nextInt(50)
      val q = (sql: String) => sql
      val t =
        s"""SELECT coalesce(array_contains(arr_i, $v), false) AS has_v,
           |  CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(coalesce(array_position(${filtNN("arr_i")}, $v), -1)) AS BIGINT) AS sum_pos
           |FROM nested GROUP BY 1 ORDER BY 1""".stripMargin
      (q(t), q(t))

    case 3 => // sorted-array fingerprint group (±distinct: DuckDB's
      // list_distinct is UNORDERED and null-dropping vs Spark's
      // order-preserving array_distinct — the null filter + re-sort
      // makes the two agree)
      val arr = pick(r, Seq("arr_s", "arr_i"))
      val sep = pick(r, Seq("|", ";"))
      val (fs, fd) =
        if (r.nextBoolean())
          (s"array_join(array_sort(array_distinct(${filtNN(arr)})), '$sep')",
           s"CASE WHEN $arr IS NULL THEN NULL ELSE coalesce(" +
             s"array_to_string(array_sort(list_distinct(${filtNN(arr)})), '$sep'), '') END")
        else fp(arr, sep)
      def q(f: String) =
        s"""SELECT $f AS fpr, CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(fs), q(fd))

    case 4 => // HOF transform + elementwise sum, bucketed
      val c = 1 + r.nextInt(5)
      val d = r.nextInt(10)
      val k = pick(r, Seq(7, 11, 13))
      val (as, ad) = asum(s"transform(arr_i, x_ -> x_ * $c + $d)",
                          s"list_transform(arr_i, x_ -> x_ * $c + $d)")
      def q(a: String) =
        s"""SELECT tsum % $k AS g, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(tsum) AS BIGINT) AS total
           |FROM (SELECT CASE WHEN arr_i IS NULL THEN CAST(NULL AS BIGINT)
           |                  ELSE CAST($a AS BIGINT) END AS tsum FROM nested) t
           |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(as), q(ad))

    case 5 => // struct field access + aggregate (null rows/fields)
      val pred = if (r.nextBoolean()) s"WHERE st.a % ${2 + r.nextInt(4)} = ${r.nextInt(2)}"
                 else ""
      val t =
        s"""SELECT st.b AS b, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(st.a) AS BIGINT) AS sum_a,
           |  CAST(sum(st.inr.c) AS BIGINT) AS sum_c
           |FROM nested $pred GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (t, t)

    case 6 => // struct literal equality (bridged literal syntax)
      val c = r.nextInt(12)
      val d = pick(r, Seq("p", "q", "r"))
      def q(lit: String) =
        s"""SELECT CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(count(st.b) AS BIGINT) AS n_b
           |FROM nested WHERE st.inr = $lit""".stripMargin
      (q(s"named_struct('c', CAST($c AS BIGINT), 'd', '$d')"),
       q(s"{'c': CAST($c AS BIGINT), 'd': '$d'}"))

    case 7 => // map keys fingerprint + cardinality
      val (ks, kd) = fp("map_keys(m)", ",")
      def q(f: String) =
        s"""SELECT $f AS ks, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(cardinality(m)) AS BIGINT) AS sum_card
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(ks), q(kd))

    case 8 => // map value lookup (try_element_at vs element_at[1])
      val k = pick(r, Seq("k0", "k1", "k2", "k3", "zz"))
      def q(get: String) =
        s"""SELECT $get AS v, CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(s"try_element_at(m, '$k')"), q(s"element_at(m, '$k')[1]"))

    case 9 => // map values sum (null values filtered, null map guarded)
      val (as, ad) = asum("map_values(m)", "map_values(m)")
      def q(a: String) =
        s"""SELECT CASE WHEN m IS NULL THEN CAST(NULL AS BIGINT)
           |            ELSE CAST($a AS BIGINT) END % 9 AS g,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(as), q(ad))

    case 10 => // explode + FK join to a flat fixture table
      val pred = modPred(r)
      def q(ex: String) =
        s"""SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
           |FROM (SELECT $ex(arr_i) AS x FROM nested WHERE $pred) e
           |JOIN nation ON e.x % 25 = nation.n_nationkey
           |GROUP BY 1 ORDER BY 1""".stripMargin
      (q("explode"), q("unnest"))

    case 11 => // flatten (null inners filtered — pinned divergence) + slice
      val p = 1 + r.nextInt(3)
      val len = 1 + r.nextInt(3)
      val flatS = s"flatten(${filtNN("aa")})"
      def q(sz: String, slfp: String) =
        s"""SELECT CASE WHEN aa IS NULL THEN CAST(NULL AS BIGINT)
           |            ELSE CAST($sz AS BIGINT) END AS flat_sz,
           |  $slfp AS sl_fp, CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      (q(size(flatS)._1, fp(s"slice(arr_i, $p, $len)", ",")._1),
       q(size(flatS)._2, fp(s"list_slice(arr_i, $p, ${p + len - 1})", ",")._2))

    case 12 => // string-function cocktail over the patterned column.
      // All random params are drawn ONCE before the expression strings
      // are built, so the (name-portable) Spark and DuckDB texts see
      // identical values — a nextInt inside each interpolation would
      // silently desynchronize the pair.
      val target = pick(r, Seq("red", "blue", "x_1"))
      val n1 = 1 + r.nextInt(3)
      val n2 = 1 + r.nextInt(4)
      val part = 1 + r.nextInt(2)
      val pad = 6 + r.nextInt(4)
      val likeTok = pick(r, Seq("red", "tail", "1"))
      // split_part pin (found by this fuzzer's first sweep): DuckDB's
      // split_part(NULL, d, n) = '' — it does NOT propagate NULL like
      // every other string function here (and like Spark's) — so its
      // DuckDB twin carries an explicit null guard.
      def guardNullS(duckExpr: String) =
        s"CASE WHEN s IS NULL THEN NULL ELSE $duckExpr END"
      val (es, ed) = pick(r, Seq[(String, String)](
        (s"upper(substring(s, $n1, $n2))", s"upper(substring(s, $n1, $n2))"),
        (s"split_part(s, '_', $part)", guardNullS(s"split_part(s, '_', $part)")),
        ("regexp_extract(s, '([0-9]+)', 1)", "regexp_extract(s, '([0-9]+)', 1)"),
        (s"CAST(position('$target' IN s) AS BIGINT)",
         s"CAST(position('$target' IN s) AS BIGINT)"),
        (s"CAST(levenshtein(substring(s, 1, 4), '$target') AS BIGINT)",
         s"CAST(levenshtein(substring(s, 1, 4), '$target') AS BIGINT)"),
        ("translate(lower(s), 'abde', 'xyzw')", "translate(lower(s), 'abde', 'xyzw')"),
        (s"lpad(split_part(s, ',', 1), $pad, '0')",
         guardNullS(s"lpad(split_part(s, ',', 1), $pad, '0')")),
        ("replace(s, '_', '-')", "replace(s, '_', '-')"),
        (s"CASE WHEN s LIKE '%$likeTok%' THEN 'y' ELSE 'n' END",
         s"CASE WHEN s LIKE '%$likeTok%' THEN 'y' ELSE 'n' END")))
      def q(e: String) =
        s"""SELECT $e AS v, CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin
      (q(es), q(ed))

    case 13 => // true ANSI LATERAL over an array (correlated derived
      // table — both engines accept `FROM t, LATERAL (...)`)
      val kk = pick(r, Seq(5, 7, 9))
      val pred = modPred(r)
      def q(ex: String) =
        s"""SELECT t.id % $kk AS g, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(u.x) AS BIGINT) AS sx
           |FROM nested t, LATERAL (SELECT $ex(${filtNN("t.arr_i")}) AS x) u
           |WHERE $pred GROUP BY 1 ORDER BY 1""".stripMargin
      (q("explode"), q("unnest"))

    case 15 => // positional explode: Spark posexplode (0-based pos) vs
      // DuckDB inline unnest + generate_subscripts (1-based, lockstep
      // expansion — WITH ORDINALITY is unimplemented in DuckDB 1.0)
      val kk = pick(r, Seq(4, 6, 8))
      val sq = s"""SELECT x, CAST(count(*) AS BIGINT) AS cnt,
                  |  CAST(sum(i) AS BIGINT) AS sum_pos
                  |FROM (SELECT pos + 1 AS i, col AS x
                  |      FROM (SELECT posexplode(arr_i) FROM nested WHERE id % $kk != 0) p) t
                  |GROUP BY x ORDER BY x NULLS FIRST""".stripMargin
      val dq = s"""SELECT x, CAST(count(*) AS BIGINT) AS cnt,
                  |  CAST(sum(i) AS BIGINT) AS sum_pos
                  |FROM (SELECT generate_subscripts(arr_i, 1) AS i, unnest(arr_i) AS x
                  |      FROM nested WHERE id % $kk != 0) t
                  |GROUP BY x ORDER BY x NULLS FIRST""".stripMargin
      (sq, dq)

    case 14 => // map_entries explode: per-key value aggregation (null
      // map values aggregate-skipped identically)
      def q(ex: String) =
        s"""SELECT e.key AS k, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(e.value) AS BIGINT) AS sv,
           |  CAST(count(e.value) AS BIGINT) AS nv
           |FROM (SELECT $ex(map_entries(m)) AS e FROM nested) t
           |GROUP BY 1 ORDER BY 1""".stripMargin
      (q("explode"), q("unnest"))

    case 16 => // map_filter: DuckDB 1.0 has no map HOFs, so the twin
      // works on map_entries: list_filter(entries, e -> p(e.value)).
      // A NULL map value makes the predicate NULL — BOTH engines drop
      // the entry (probed); a NULL map stays NULL via the CASE guard;
      // the kept-sum twin coalesces DuckDB's list_sum([]) = NULL to
      // Spark's aggregate-over-empty = 0.
      val md = 2 + r.nextInt(3)
      val rr = r.nextInt(md)
      val sq =
        s"""SELECT CASE WHEN m IS NULL THEN CAST(NULL AS BIGINT)
           |            ELSE CAST(cardinality(map_filter(m, (k_, v_) -> v_ % $md = $rr)) AS BIGINT) END AS n_kept,
           |  CASE WHEN m IS NULL THEN CAST(NULL AS BIGINT)
           |       ELSE CAST(aggregate(map_values(map_filter(m, (k_, v_) -> v_ % $md = $rr)),
           |                           CAST(0 AS BIGINT), (s_, x_) -> s_ + x_) AS BIGINT) END AS sv,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      val dq =
        s"""SELECT CASE WHEN m IS NULL THEN CAST(NULL AS BIGINT)
           |            ELSE CAST(len(list_filter(map_entries(m), e_ -> e_.value % $md = $rr)) AS BIGINT) END AS n_kept,
           |  CASE WHEN m IS NULL THEN CAST(NULL AS BIGINT)
           |       ELSE CAST(coalesce(list_sum(list_transform(
           |              list_filter(map_entries(m), e_ -> e_.value % $md = $rr),
           |              e_ -> e_.value)), 0) AS BIGINT) END AS sv,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      (sq, dq)

    case 17 => // transform_keys + transform_values fingerprints: the
      // DuckDB twin rebuilds both from map_entries. NULL values pin to
      // -1/-9 sentinels BEFORE the arithmetic so neither engine's
      // null-propagation (identical, but then null-sorted differently)
      // reaches the fingerprint; both sides re-sort (the map entry
      // order is not contractual).
      val c = 1 + r.nextInt(4)
      val sq =
        s"""SELECT CASE WHEN m IS NULL THEN NULL
           |            ELSE array_join(array_sort(map_keys(transform_keys(m,
           |              (k_, v_) -> concat(k_, '#', CAST(coalesce(v_, -1) % 5 AS STRING))))), ',') END AS kf,
           |  CASE WHEN m IS NULL THEN NULL
           |       ELSE array_join(array_sort(transform(map_values(transform_values(m,
           |         (k_, v_) -> coalesce(v_ * $c, -9))), x_ -> CAST(x_ AS STRING))), ',') END AS vf,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      val dq =
        s"""SELECT CASE WHEN m IS NULL THEN NULL
           |            ELSE coalesce(array_to_string(array_sort(list_transform(map_entries(m),
           |              e_ -> concat(e_.key, '#', CAST(coalesce(e_.value, -1) % 5 AS VARCHAR)))), ','), '') END AS kf,
           |  CASE WHEN m IS NULL THEN NULL
           |       ELSE coalesce(array_to_string(array_sort(list_transform(map_entries(m),
           |         e_ -> CAST(coalesce(e_.value * $c, -9) AS VARCHAR))), ','), '') END AS vf,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      (sq, dq)

    case 18 => // arrays-of-structs: build struct elements in-row from
      // arr_i, explode, access fields, re-aggregate (null elements
      // filtered first so both engines see identical struct rows)
      val gg = pick(r, Seq(3, 4, 5))
      val pred = modPred(r)
      val sq =
        s"""SELECT t.e.g2 AS g, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(t.e.v) AS BIGINT) AS sv
           |FROM (SELECT explode(transform(${filtNN("arr_i")},
           |        x_ -> named_struct('v', x_, 'g2', x_ % $gg))) AS e
           |      FROM nested WHERE $pred) t
           |GROUP BY 1 ORDER BY 1""".stripMargin
      val dq =
        s"""SELECT t.e.g2 AS g, CAST(count(*) AS BIGINT) AS cnt,
           |  CAST(sum(t.e.v) AS BIGINT) AS sv
           |FROM (SELECT unnest(list_transform(${filtNN("arr_i")},
           |        x_ -> {'v': x_, 'g2': x_ % $gg})) AS e
           |      FROM nested WHERE $pred) t
           |GROUP BY 1 ORDER BY 1""".stripMargin
      (sq, dq)

    case 19 => // depth-parameterized nesting: d struct wraps accessed
      // back down, and d array wraps flattened back down (the current
      // families pin ONE shape; this varies the depth). The array side
      // wraps only a null-guarded, null-filtered arr_i — Spark nulls a
      // whole flatten on a null inner array while DuckDB skips it
      // (pinned divergence), so no null may reach the wrap.
      val d = 1 + r.nextInt(3)
      val wrapS = "named_struct('w', " * d + "st" + ")" * d + ".w" * d + ".a"
      val wrapD = "{'w': " * d + "st" + "}" * d + ".w" * d + ".a"
      def wrapArr(open: String, close: String, a: String) =
        "flatten(" * d + (open * d) + a + (close * d) + ")" * d
      val (as2, ad2) = asum(wrapArr("array(", ")", filtNN("arr_i")),
                            wrapArr("[", "]", filtNN("arr_i")))
      def q(sa: String, arrSum: String) =
        s"""SELECT CAST($sa AS BIGINT) AS wa,
           |  CASE WHEN arr_i IS NULL THEN CAST(NULL AS BIGINT)
           |       ELSE CAST($arrSum AS BIGINT) END AS asum,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM nested GROUP BY 1, 2 ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin
      (q(wrapS, as2), q(wrapD, ad2))
  }

  /** n seeded (name, sparkSql, duckSql) triples */
  def queries(seed: Long, n: Int): Seq[(String, String, String)] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val (s, d) = genOne(r)
      (f"nfuzz_q$i%03d", s, d)
    }
  }
}

package graft.generate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Nested-column fixture generator for the differential SQL fuzzer
  * (round-13 verdict item 1). The shipped fixtures are flat (only
  * `embeddings.embedding` is a list, and it is float-typed — useless
  * for exact cross-engine comparison), but the reference's row model is
  * deeply nested — STRUCT/ARRAY at arbitrary depth, MAP, null array
  * elements (`AvroSchemaUtil.java:298-322`,
  * `RecordToStructConverter.java:214-216`) — so the query-side fuzz
  * needs a nested twin table the same way the null twin (graft.NullGen)
  * backs the 3VL families.
  *
  * Every value is a deterministic crc32 function of (id, salt): the
  * table is WRITTEN once by Spark, then both engines read identical
  * parquet bytes, so generation determinism only has to hold within one
  * Spark run. Null planting is layered the way the reference's Avro
  * model allows: null ARRAYS, null array ELEMENTS, null STRUCT rows,
  * null struct FIELDS, null nested structs, null MAP rows, null map
  * VALUES, null/empty strings — each on its own decorrelated residue
  * class (the crc32 mixing discipline from NullGen, ADVICE r12).
  *
  * Columns:
  *   id     BIGINT                      unique key (ORDER BY tiebreak)
  *   arr_i  ARRAY<BIGINT>               len 0-6, values %50, null elems
  *   arr_s  ARRAY<STRING>               len 0-5, pool incl. '' and dups
  *   aa     ARRAY<ARRAY<BIGINT>>        len 0-3 of len 0-3, null inners
  *   st     STRUCT<a BIGINT, b STRING,  null rows, null b, null inr
  *             inr STRUCT<c BIGINT, d STRING>>   ('inr' not 'inner' —
  *                                      INNER is a DuckDB keyword)
  *   m      MAP<STRING,BIGINT>          keys k0-k3 kept ~2/3, null vals
  *   s      STRING                      patterned 'Xy123_red,tail' mix
  *                                      for the string-function family
  */
object NestedGen {

  /** crc32-mixed residue selector: h(salt) % m */
  private def h(salt: String, m: Int): String =
    s"(crc32(concat(CAST(id AS STRING), ':$salt')) % $m)"

  private def hi(salt: String, m: Int): String =
    s"(crc32(concat(CAST(id AS STRING), ':', CAST({I} AS STRING), ':$salt')) % $m)"

  def frame(spark: SparkSession, n: Long): DataFrame = {
    // slice(sequence(1,K), 1, len) gives a 0..K-length index vector
    // (sequence(1,0) would be the DESCENDING [1,0], so slice is the
    // empty-array-safe form).
    def idx(k: Int, lenExpr: String) =
      s"slice(sequence(1, $k), 1, CAST($lenExpr AS INT))"

    val arrI = {
      val elem = hi("arri:v", 50).replace("{I}", "i")
      val elemNull = hi("arri:ne", 11).replace("{I}", "i")
      s"""CASE WHEN ${h("arri:null", 13)} = 0 THEN NULL
         |     ELSE transform(${idx(6, h("arri:len", 7))},
         |                    i -> CASE WHEN $elemNull = 0 THEN NULL
         |                              ELSE CAST($elem AS BIGINT) END)
         |END AS arr_i""".stripMargin
    }

    val arrS = {
      val pool = "array('red', 'blue', 'Green', '', 'x_1', 'a,b', 'ZZ')"
      val pick = hi("arrs:v", 7).replace("{I}", "i")
      val elemNull = hi("arrs:ne", 11).replace("{I}", "i")
      s"""CASE WHEN ${h("arrs:null", 13)} = 0 THEN NULL
         |     ELSE transform(${idx(5, h("arrs:len", 6))},
         |                    i -> CASE WHEN $elemNull = 0 THEN NULL
         |                              ELSE element_at($pool, CAST($pick AS INT) + 1) END)
         |END AS arr_s""".stripMargin
    }

    val aa = {
      val innerNull = hi("aa:in", 9).replace("{I}", "j")
      val innerLen = hi("aa:il", 4).replace("{I}", "j")
      val elem = "(crc32(concat(CAST(id AS STRING), ':', CAST(j AS STRING), ':', CAST(i AS STRING), ':aa:v')) % 40)"
      s"""CASE WHEN ${h("aa:null", 13)} = 0 THEN NULL
         |     ELSE transform(${idx(3, h("aa:len", 4))},
         |                    j -> CASE WHEN $innerNull = 0 THEN NULL
         |                              ELSE transform(slice(sequence(1, 3), 1, CAST($innerLen AS INT)),
         |                                             i -> CAST($elem AS BIGINT)) END)
         |END AS aa""".stripMargin
    }

    val st = {
      val bPool = "array('alpha', 'beta', 'gamma', 'delta')"
      val dPool = "array('p', 'q', 'r')"
      s"""CASE WHEN ${h("st:null", 13)} = 0 THEN NULL
         |     ELSE named_struct(
         |       'a', CAST(${h("st:a", 25)} AS BIGINT),
         |       'b', CASE WHEN ${h("st:bn", 9)} = 0 THEN NULL
         |                 ELSE element_at($bPool, CAST(${h("st:b", 4)} AS INT) + 1) END,
         |       'inr', CASE WHEN ${h("st:in", 9)} = 0 THEN NULL
         |                   ELSE named_struct(
         |                     'c', CAST(${h("st:c", 12)} AS BIGINT),
         |                     'd', element_at($dPool, CAST(${h("st:d", 3)} AS INT) + 1)) END)
         |END AS st""".stripMargin
    }

    val m = {
      def entry(k: String) =
        s"""'$k', CASE WHEN (crc32(concat(CAST(id AS STRING), ':m:$k:nv')) % 7) = 0
           |           THEN CAST(NULL AS BIGINT)
           |           ELSE CAST((crc32(concat(CAST(id AS STRING), ':m:$k:v')) % 30) AS BIGINT) END""".stripMargin
      s"""CASE WHEN ${h("m:null", 13)} = 0 THEN NULL
         |     ELSE map_filter(map(${Seq("k0", "k1", "k2", "k3").map(entry).mkString(", ")}),
         |                     (k, v) -> crc32(concat(CAST(id AS STRING), ':m:keep:', k)) % 3 > 0)
         |END AS m""".stripMargin
    }

    val s = {
      val head = "element_at(array('Ab', 'cd', 'EF', 'xy'), CAST(" + h("s:h", 4) + " AS INT) + 1)"
      val word = "element_at(array('red', 'blue', 'green'), CAST(" + h("s:w", 3) + " AS INT) + 1)"
      s"""CASE WHEN ${h("s:null", 11)} = 0 THEN NULL
         |     WHEN ${h("s:empty", 10)} = 0 THEN ''
         |     ELSE concat($head, CAST(${h("s:num", 1000)} AS STRING), '_', $word,
         |                 CASE WHEN ${h("s:tail", 3)} = 0 THEN ',tail' ELSE '' END)
         |END AS s""".stripMargin
    }

    spark.range(n).toDF("id").selectExpr("id", arrI, arrS, aa, st, m, s)
  }

  /** Write the nested fixture once; both engines then read these bytes. */
  def write(spark: SparkSession, n: Long, out: String): Unit =
    frame(spark, n).coalesce(4).write.mode("overwrite").parquet(out)
}

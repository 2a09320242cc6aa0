package graft.pipelines

import java.nio.file.{Files, Paths}
import graft.SparkSpec

class MainSpec extends SparkSpec {

  test("arg parsing: --key=value and bare flags") {
    val (t, o) = Main.parseArgs(Array("query-to-text",
      "--query=SELECT 1", "--withoutSharding", "--output=/tmp/x"))
    assert(t === "query-to-text")
    assert(o === Map("query" -> "SELECT 1", "withoutSharding" -> "true",
      "output" -> "/tmp/x"))
  }

  test("query-to-text end-to-end through the CLI surface") {
    val dir = tmpDir("cli")
    Main.run(spark, "query-to-text", Map(
      "tablesDir" -> "/root/testdata/sf0.001",
      "query" -> "SELECT r_regionkey, r_name FROM region",
      "output" -> s"$dir/r", "format" -> "csv", "withoutSharding" -> "true",
      "outputNotify" -> s"$dir/n.txt"))
    assert(Files.exists(Paths.get(s"$dir/r.csv")))
    assert(Files.readAllLines(Paths.get(s"$dir/r.csv")).size === 5)
  }

  test("dummy-to-upsert through the CLI: schema from catalog parquet") {
    val dir = tmpDir("cli_dummy")
    val yaml = s"$dir/config.yaml"
    Files.writeString(Paths.get(yaml),
      """tables:
        |  - table: region
        |    count: 50
        |    primaryKeys: [r_regionkey]
        |""".stripMargin)
    Main.run(spark, "dummy-to-upsert", Map(
      "tablesDir" -> "/root/testdata/sf0.001",
      "config" -> yaml, "outputDir" -> s"$dir/out", "parallelNum" -> "2"))
    val out = spark.read.parquet(s"$dir/out/region")
    assert(out.count() === 50)
    assert(out.columns.toSet ===
      spark.read.parquet("/root/testdata/sf0.001/region.parquet").columns.toSet)
  }

  test("compact through the CLI: fragmented table rewritten in place") {
    import spark.implicits._
    val dir = tmpDir("cli_compact")
    (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(s"$dir/t")
    Main.run(spark, "compact", Map("dir" -> s"$dir/t"))
    assert(spark.read.parquet(s"$dir/t").inputFiles.length === 1)
    assert(spark.read.parquet(s"$dir/t").count() === 500L)
  }

  test("unknown template rejected") {
    intercept[IllegalArgumentException](Main.run(spark, "nope", Map.empty))
  }
}

package graft.sinks

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** K1/K8 semantics: exact naming, split-by-field, header, notify, empty. */
class DynamicFileSinkSpec extends SparkSpec {

  private def lines(p: String): Seq[String] =
    Files.readAllLines(Paths.get(p)).asScala.toSeq

  test("split by field, exact <prefix><key>.<type> names, notify listing") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("B", 2L), ("A", 3L)).toDF("k", "v")
    val dir = tmpDir("dfs")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/out", "json", splitField = Some("k"), withoutSharding = true,
      outputNotify = Some(s"$dir/notify.txt")))
    assert(res.files.map(_.split('/').last).sorted === Seq("outA.json", "outB.json"))
    val a = lines(s"$dir/outA.json").sorted
    assert(a === Seq("""{"k":"A","v":1}""", """{"k":"A","v":3}"""))
    assert(lines(s"$dir/notify.txt").mkString("\n").split("\n").length === 2)
  }

  test("shardExport: exact shard names, every row carries its shard, two runs agree byte-for-byte") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"doc$i")).toDF("id", "payload")
    val d1 = tmpDir("shard1"); val d2 = tmpDir("shard2")
    val r1 = ShardExport.write(df, "id", s"$d1/x_", numShards = 4,
      seed = "s", format = "csv")
    val r2 = ShardExport.write(df, "id", s"$d2/x_", numShards = 4,
      seed = "s", format = "csv")
    val names = r1.files.map(_.split('/').last).sorted
    assert(names === (0 until 4).map(i => f"x_shard-$i%05d-of-00004.csv"))
    // determinism: independent runs produce identical per-shard content
    names.foreach { n =>
      assert(lines(s"$d1/$n") === lines(s"$d2/$n"), s"shard $n diverged")
    }
    // completeness + embedded shard key matches the file the row landed in
    val all = names.flatMap(n => lines(s"$d1/$n").map(l => (n, l)))
    assert(all.length === 200)
    all.foreach { case (n, l) =>
      assert(l.endsWith(n.stripPrefix("x_").stripSuffix(".csv")),
        s"row '$l' embeds a shard key unlike its file $n")
    }
    // a different seed moves at least one row (the shuffle is seeded)
    val r3 = ShardExport.write(df, "id", s"${tmpDir("shard3")}/x_",
      numShards = 4, seed = "other", format = "csv")
    val moved = r3.files.map(_.split('/').last).sorted.zip(names).exists {
      case (n3, n1) => lines(r3.files.find(_.endsWith(n3)).get) != lines(s"$d1/$n1")
    }
    assert(moved, "seed change did not alter any shard content")
  }

  test("csv with header line") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("a", "b")
    val dir = tmpDir("dfs_csv")
    DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/r", "csv", withoutSharding = true, header = Some("a,b")))
    assert(lines(s"$dir/r.csv") === Seq("a,b", "1,x"))
  }

  test("perKeySchema: each avro destination keeps only its observed columns") {
    import spark.implicits._
    // key A rows never populate `extra`; key B rows do — with
    // perKeySchema, A's file schema must omit `extra`, B's must keep it
    // (the per-destination schema sampling of StructToAvroTransform
    // .java:95-108, re-expressed as deterministic observed-field pruning).
    val df = Seq(
      ("A", 1L, Option.empty[String]),
      ("A", 2L, Option.empty[String]),
      ("B", 3L, Some("hello"))
    ).toDF("k", "v", "extra")
    val dir = tmpDir("dfs_perkey")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/out", "avro", splitField = Some("k"), perKeySchema = true))
    val byKey = res.files.map(p => p.split('/').last -> p).toMap
    assert(byKey.keySet === Set("outA.avro", "outB.avro"))
    val a = graft.sources.AvroIO.read(spark, byKey("outA.avro"))
    assert(a.schema.fieldNames.toSet === Set("k", "v"))
    assert(a.orderBy("v").as[(String, Long)].collect().toSeq ===
      Seq(("A", 1L), ("A", 2L)))
    val b = graft.sources.AvroIO.read(spark, byKey("outB.avro"))
    assert(b.schema.fieldNames.toSet === Set("k", "v", "extra"))
    assert(b.as[(String, Long, String)].collect().toSeq === Seq(("B", 3L, "hello")))
    // default mode is unchanged: one schema for every destination
    val res2 = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/uni", "avro", splitField = Some("k")))
    res2.files.foreach { p =>
      assert(graft.sources.AvroIO.read(spark, p).schema.fieldNames.toSet ===
        Set("k", "v", "extra"))
    }
  }

  test("null split key goes to empty-string destination") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 1L), (Some("K"), 2L)).toDF("k", "v")
    val dir = tmpDir("dfs_null")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/out", "json", splitField = Some("k"), withoutSharding = true))
    assert(res.files.map(_.split('/').last).sorted === Seq("out.json", "outK.json"))
  }

  test("multi-shard destinations get indexed names, single-shard exact names") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (if (i % 2 == 0) "E" else "O", i))
      .toDF("k", "v").repartition(4)
    val dir = tmpDir("dfs_shards")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/out", "json", splitField = Some("k")))
    val names = res.files.map(_.split('/').last)
    // 4 partitions × 2 keys -> several parts per key, indexed -NNNNN
    assert(names.forall(n => n.matches("out[EO]-\\d{5}\\.json") || n.matches("out[EO]\\.json")))
    val totalLines = res.files.map(f => lines(f).size).sum
    assert(totalLines === 100)
  }

  test("empty result + outputEmpty writes marker file with header") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("a", "b").filter("a < 0")
    val dir = tmpDir("dfs_empty")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/none", "csv", withoutSharding = true, header = Some("a,b"),
      outputEmpty = true, outputNotify = Some(s"$dir/n.txt")))
    assert(res.files.map(_.split('/').last) === Seq("none.csv"))
    assert(lines(s"$dir/none.csv") === Seq("a,b"))
  }

  test("avro snappy round-trip with split") {
    import spark.implicits._
    val df = Seq(("A", 1L), ("B", 2L)).toDF("k", "v")
    val dir = tmpDir("dfs_avro")
    val res = DynamicFileSink.write(df, DynamicFileSink.Config(
      s"$dir/part", "avro", splitField = Some("k")))
    assert(res.files.map(_.split('/').last).sorted === Seq("partA.avro", "partB.avro"))
    val back = graft.sources.AvroIO.read(spark, s"$dir/partA.avro")
    assert(back.select("v").collect().map(_.getLong(0)) === Array(1L))
  }
}

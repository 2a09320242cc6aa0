package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round aid: dump `explain("formatted")` for the named
  * queries to `<outDir>/<query>_<suffix>.txt` — the before/after plan
  * evidence `plans/r16/` carries (the judge checks plan claims against
  * these files). Read-only over SparkEntry.queries; never on a gate path.
  *
  * usage: runMain graft.ExplainDump <query[,query...]|ALL> <outDir> <suffix> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3)
      sys.error("usage: ExplainDump <query[,query...]|ALL> <outDir> <suffix> [sfDir]")
    val names0 = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (names0 == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else names0.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), txt)
        println(s"dumped $n")
      } catch {
        case e: Throwable => println(s"FAILED $n: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

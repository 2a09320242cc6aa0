package graft

import org.apache.spark.sql.SparkSession
import scala.util.Random

/** Full-sweep runner for the temporal-join tier differential fuzz
  * ([[graft.fuzz.TemporalFuzz]]): replays `seeds × sets` seeded
  * adversarial event/interval sets through the as-of joins (backward /
  * forward / nearest ± tie collapse), the bin-blocked range/overlap
  * joins and the EventStream batch faces (sessionization, CDC
  * keep-latest, quotas, tumbling/hopping windows) against plain-Scala
  * reference models and prints one JSON line with the divergence count.
  * Every 4th set runs the deep checks (partitioning invariance).
  *
  * usage: graft.FuzzTemporal [nSets] [seed1,seed2,...]
  */
object FuzzTemporal {
  def main(args: Array[String]): Unit = {
    val nSets = if (args.length > 0) args(0).toInt else 50
    val seeds = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq
                else Seq(12L, 99L, 7L, 42L, 2026L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var total = 0
    var failures = 0
    for (seed <- seeds) {
      val r = new Random(seed)
      for (i <- 0 until nSets) {
        val set = graft.fuzz.TemporalFuzz.tempoSet(r)
        val deep = i % 4 == 0
        val errs = graft.fuzz.TemporalFuzz.runOne(spark, set, deep)
        total += 1
        if (errs.nonEmpty) {
          failures += 1
          errs.foreach(e => System.err.println(s"[tfuzz seed=$seed set=$i] $e"))
          val minimal = graft.fuzz.Shrink.ddmin(set.events,
            (es: Seq[graft.fuzz.TemporalFuzz.ERow]) =>
              try graft.fuzz.TemporalFuzz.runOne(spark,
                set.copy(events = es), deep).nonEmpty
              catch { case _: Throwable => true })
          System.err.println(s"[tfuzz seed=$seed set=$i] SHRUNK events repro " +
            s"(${minimal.size} events, ${set.p}): " +
            minimal.map(e => s"${e.user_id}/${e.event_type}@${e.ts}=${e.value}")
              .mkString(" | "))
        }
        spark.catalog.clearCache()
      }
    }
    println(s"""{"tfuzz_sets":$total,"seeds":${seeds.size},"divergent_sets":$failures}""")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

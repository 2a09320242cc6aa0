package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph statistics over a canonical pair list — the structural
  * diagnostics read before choosing a dedup cluster-collapse policy
  * (g_kcore / g_triangles / g_assortativity / g_modularity), extracted
  * from the gate registries so the SAME shipped algebra is (a) called by
  * the oracle gates and (b) differentially fuzzable against plain-Scala
  * reference models on adversarial random graphs ([[graft.fuzz.GraphFuzz]]) — the
  * CorpusFuzz discipline applied to the graph tier.
  *
  * Input contract (the MinHash-LSH pair frame's shape): `pairs` holds
  * one row per undirected edge, canonically oriented d1 < d2, distinct,
  * no self-loops. Every function is a pure function of that edge set —
  * partitioning-, schedule- and engine-invariant (exact integer moments;
  * doubles only in final rounded divisions).
  *
  * Scale shape: each statistic is keyed aggregates + equi-joins over the
  * pair frame (no vertex×vertex work); k-core rounds localCheckpoint with
  * the ConnectedComponents lineage discipline.
  */
object GraphStats {

  /** Bounded k-core peel: strip endpoints of degree < k from the pair
    * list, `rounds` times (fixed rounds — static plan). Returns the
    * surviving edge frame (same columns d1, d2). */
  def kcorePeel(pairs: DataFrame, rounds: Int = 5, k: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be positive, got $rounds")
    require(k >= 1, s"k must be positive, got $k")
    // localCheckpoint per round: each round references `edges` three
    // times, so without lineage truncation the upstream chain (e.g. a
    // full MinHash run) would replicate ~3^rounds times in the plan.
    var edges = pairs.select(col("d1"), col("d2")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = edges.select(col("d1").as("v"))
        .unionAll(edges.select(col("d2").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("v")
      edges = edges
        .join(keep.withColumnRenamed("v", "d1"), Seq("d1"), "left_semi")
        .join(keep.withColumnRenamed("v", "d2"), Seq("d2"), "left_semi")
        .select("d1", "d2").localCheckpoint()
    }
    edges
  }

  /** Triangle census: (n_edges, n_triangles, n_wedges, clustering_coeff).
    * Triangles via the canonical a<b<c three-way equi-join (each triangle
    * joins exactly once under the d1<d2 orientation); wedges from degree
    * moments; global clustering coefficient 3T/W rounded 6 dp. */
  def triangleCensus(pairs: DataFrame): DataFrame = {
    val p = pairs.select("d1", "d2").cache()
    val tri = p.as("e1")
      .join(p.as("e2"), col("e2.d1") === col("e1.d2"))
      .join(p.as("e3"),
        col("e3.d1") === col("e1.d1") && col("e3.d2") === col("e2.d2"))
      .agg(count(lit(1)).as("n_triangles"))
    val wed = p.select(col("d1").as("u"))
      .union(p.select(col("d2").as("u")))
      .groupBy("u").agg(count(lit(1)).as("deg"))
      .agg(sum(expr("(deg * (deg - 1)) div 2")).as("n_wedges"))
    p.agg(count(lit(1)).as("n_edges"))
      .crossJoin(tri).crossJoin(wed)
      .withColumn("clustering_coeff",
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)))
  }

  /** Degree assortativity (Pearson r over stub-endpoint degrees, each
    * edge counted in both orientations): (n_edges, assortativity).
    * Exact integer moment sums; one rounded double division at the end. */
  def assortativity(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("d1"), col("d2"))
    val deg = p.select(col("d1").as("v"))
      .union(p.select(col("d2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val stubs = p
      .join(deg.withColumnRenamed("v", "d1").withColumnRenamed("deg", "ka"), "d1")
      .join(deg.withColumnRenamed("v", "d2").withColumnRenamed("deg", "kb"), "d2")
      .select(col("ka").as("x"), col("kb").as("y"))
    val sym = stubs.unionAll(stubs.select(col("y").as("x"), col("x").as("y")))
    sym.agg(count(lit(1)).as("m2"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select((col("m2") / 2).cast("long").as("n_edges"),
        when(col("m2") * col("sxx") - col("sx") * col("sx") > 0,
          round((col("m2") * col("sxy") - col("sx") * col("sx")).cast("double") /
            (col("m2") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
          .as("assortativity"))
  }

  /** Modularity of a given vertex partition (Newman 2006): per part,
    * Q_c = m_in/m − (d_c/2m)². `membership` is (v, part); vertices
    * absent from it drop their edges from the census (the gate passes a
    * total membership). Output: (part, m_in, d_sum, q_part), one row per
    * part that has at least one incident edge, ordered by part. */
  def modularity(pairs: DataFrame, membership: DataFrame): DataFrame = {
    val p = pairs.select(col("d1"), col("d2"))
    val e = p
      .join(membership.select(col("v").as("d1"), col("part").as("p1")), "d1")
      .join(membership.select(col("v").as("d2"), col("part").as("p2")), "d2")
    val m = e.agg(count(lit(1)).as("m"))
    val deg = p.select(col("d1").as("v")).union(p.select(col("d2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val dsum = deg.join(membership, "v")
      .groupBy("part").agg(sum(col("deg")).as("d_sum"))
    val within = e.filter(col("p1") === col("p2"))
      .groupBy(col("p1").as("part")).agg(count(lit(1)).as("m_in"))
    dsum.join(within, Seq("part"), "left")
      .crossJoin(m)
      .select(col("part"),
        coalesce(col("m_in"), lit(0L)).as("m_in"), col("d_sum"),
        round(coalesce(col("m_in"), lit(0L)).cast("double") / col("m") -
          (col("d_sum").cast("double") / (lit(2L) * col("m"))) *
            (col("d_sum").cast("double") / (lit(2L) * col("m"))), 6)
          .as("q_part"))
      .orderBy("part")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over an edge table — PageRank as iterated
  * join+aggregate, the companion to Dedup's min-label connected
  * components. No graph library: each iteration is one `edges ⋈ ranks`
  * shuffle keyed by source plus one `groupBy(dst)` mass sum, which is
  * exactly how a 1000-executor cluster wants it (rank state co-partitions
  * with the edge list's join keys; nothing driver-side grows with the
  * graph).
  *
  * Determinism (the registry discipline): rank mass is carried as LONG
  * integer units of `1/scale` — per-edge contributions use exact integer
  * floor division `rank div outdeg`, the incoming-mass sum is a BIGINT
  * sum (shuffle-order-independent), and the damping step is ONE double
  * multiply of an exact integer, floored back to integer units. Both
  * engines run the identical op sequence, so ranks are bit-equal after
  * any number of iterations. The floor losses make total mass shrink
  * slightly per hop (standard integer-PageRank behavior, ~outdeg·1
  * units per node per hop) — rankings are unaffected and the result is
  * exactly reproducible, which a float PageRank across engines is not.
  *
  * Dangling nodes (outdeg = 0) simply drop their mass — the common
  * simplification; add self-loops upstream if mass conservation matters.
  *
  * Lineage: ranks are `localCheckpoint`ed each iteration — without it
  * the plan doubles per hop (the CorpusPipeline analyzed-plan-explosion
  * fix); the previous iteration's checkpoint is released as soon as the
  * next materializes.
  */
object Graph {

  /** PageRank over `(srcCol, dstCol)` edges (pre-dedup them if edge
    * multiplicity should not weight the walk). Returns `(node, rank)`
    * with `rank` in integer `1/scale` units.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1)
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val deg = e.groupBy(col("__src")).agg(count(lit(1)).as("__outdeg"))
    // edge list with outdeg attached, materialized once for the loop
    val edgesDeg = e.join(deg, Seq("__src")).localCheckpoint(true)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val base = math.floor((1.0 - damping) * scale.toDouble / n).toLong
    val r0 = math.floor(scale.toDouble / n).toLong
    var ranks = nodes.withColumn("rank", lit(r0)).localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val sums = edgesDeg
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .select(col("__dst"), expr("rank div __outdeg").as("__c"))
        .groupBy(col("__dst")).agg(sum(col("__c")).as("__m"))
      val next = nodes
        .join(sums.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .select(col("node"), (lit(base) +
          floor(lit(damping) * coalesce(col("__m"), lit(0L)).cast("double"))
            .cast("long")).as("rank"))
        .localCheckpoint(true)
      ranks.rdd.unpersist(false)
      ranks = next
    }
    edgesDeg.rdd.unpersist(false)
    nodes.rdd.unpersist(false)
    ranks
  }

  /** Per-node triangle counts over an undirected edge set — the local
    * clustering signal (community density, spam-farm detection) next to
    * [[pageRank]]'s global centrality.
    *
    * Scale shape: the textbook distributed algorithm is a naive edge
    * self-join, which is quadratic in the hottest vertex's degree (one
    * celebrity node with 1e6 neighbors = 1e12 wedge rows). This
    * implementation uses DEGREE ORIENTATION: every undirected edge is
    * directed from its lower-(degree, id) endpoint to the higher, wedges
    * are enumerated only FROM the low side, and the closing edge is probed
    * in the same oriented set. Max oriented out-degree is O(√m), so total
    * wedge volume is O(m^1.5) regardless of skew — the standard bound —
    * and every join is an equi-join Catalyst shuffles by key (AQE handles
    * residual bucket skew). Each triangle is emitted exactly once, at its
    * orientation-minimal vertex — no dedup shuffle.
    *
    * Determinism: pure integer counting; the per-node expansion is a
    * 3-row explode of each triangle. Output `(node, n_triangles)` for
    * nodes in at least one triangle. Edge direction and multiplicity in
    * the input are ignored (edges are canonicalized and deduped first);
    * self-loops are dropped.
    */
  /** Canonical undirected edge set (a < b, no self-loops, deduped) and
    * per-node degrees — shared by [[triangleCounts]] and
    * [[clusteringCoefficients]].
    */
  private def undirected(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    // the canonical edge set feeds BOTH degree branches and the
    // orientation join — localCheckpoint (eager) or the upstream edge
    // derivation replays three times (100× stress: tc1 39.6 → 35.7 s,
    // tc2 32.2 → 23.6 s; tc1's floor is the one-shot pair-distinct
    // itself); same for the degree frame, read by both join sides
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .where(col("__a") =!= col("__b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(col("__a").as("node"))
      .union(und.select(col("__b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    (und, deg)
  }

  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val (und, deg) = undirected(edges, srcCol, dstCol)
    triangleCore(und, deg)
  }

  private def triangleCore(und: DataFrame, deg: DataFrame): DataFrame = {
    val aFirst = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    val oriented = und
      .join(deg.select(col("node").as("__a"), col("__deg").as("__da")),
        Seq("__a"))
      .join(deg.select(col("node").as("__b"), col("__deg").as("__db")),
        Seq("__b"))
      .select(
        when(aFirst, col("__a")).otherwise(col("__b")).as("src"),
        when(aFirst, col("__b")).otherwise(col("__a")).as("dst"),
        when(aFirst, col("__db")).otherwise(col("__da")).as("ddeg"))
      // three consumers (both wedge sides + the closing-edge probe)
      .localCheckpoint()
    // wedges from the low vertex: (x -> y), (x -> z) with y before z in
    // the orientation order; the closing edge y -> z is oriented too
    val e1 = oriented.select(col("src"), col("dst").as("y"),
      col("ddeg").as("__dy"))
    val e2 = oriented.select(col("src"), col("dst").as("z"),
      col("ddeg").as("__dz"))
    val wedges = e1.join(e2, Seq("src"))
      .where(col("__dy") < col("__dz") ||
        (col("__dy") === col("__dz") && col("y") < col("z")))
    val tri = wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("z")),
      Seq("y", "z"))
    // no final orderBy: per-node counts are proportional to the node set,
    // and a global sort of the result would dominate at scale (the
    // registry hash-compare is order-independent)
    tri.select(explode(array(col("src"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: `2·T(v) / (deg(v)·(deg(v)−1))`
    * — how close each node's neighborhood is to a clique; the per-node
    * density companion to [[triangleCounts]]'s raw counts (community
    * cores score ~1, bridge/hub nodes ~0).
    *
    * Output: `(node, degree, n_triangles, clustering_coeff)` for EVERY
    * node of the edge set — zero triangles included, degree-1 nodes
    * pinned to 0. Cost is [[triangleCounts]] plus one node-keyed left
    * join; determinism: both sides of the single IEEE division are exact
    * BIGINTs, 6dp-quantized.
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val (und, deg) = undirected(edges, srcCol, dstCol)
    val tri = triangleCore(und, deg)
    deg.join(tri, Seq("node"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn("clustering_coeff",
        when(col("__deg") >= 2,
          floor((lit(2L) * col("n_triangles")).cast("double") /
            (col("__deg") * (col("__deg") - 1)).cast("double") *
            lit(1e6) + lit(0.5)) / lit(1e6))
          .otherwise(lit(0.0)))
      .select(col("node"), col("__deg").as("degree"), col("n_triangles"),
        col("clustering_coeff"))
  }
}

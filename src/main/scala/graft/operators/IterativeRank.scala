package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank: ranks are carried as 1e-9-scaled BIGINTs
  * and every per-edge contribution uses integer division, so the iteration
  * is BIT-EXACT — re-run-stable, partitioning-independent (integer sums
  * commute exactly, unlike FP), and replayable by a SQL oracle. This is the
  * reproducibility convention for production rank pipelines; the cost is a
  * deterministic <=deg ulp (1e-9) truncation per node per iteration.
  *
  * Scale shape: per iteration, ONE shuffle joining ranks+degrees onto the
  * edge src (both co-partitioned on the same key) and ONE shuffle reducing
  * contributions on dst with map-side partial sums — the canonical
  * distributed PageRank plan. Degrees and nodes are computed once. The
  * loop unrolls into a single Catalyst plan, so AQE can reuse exchanges
  * across iterations at gate scale; a long-running production loop would
  * checkpoint every ~10 rounds to cap lineage.
  */
object IterativeRank {

  /** @param edges directed (src, dst) pairs; symmetrize before calling for
    *              an undirected graph. Dangling nodes (no out-edges) do not
    *              arise when symmetrized. */
  def apply(edges: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100,
      "IterativeRank needs iters >= 1 and dampingPct in [0, 100]")
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("u")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = 1000000000L * (100 - dampingPct) / 100
    var r = nodes.select(col("u"), lit(1000000000L).as("r"))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(r.withColumnRenamed("u", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("u"), expr("r DIV deg").as("c"))
      r = nodes
        .join(contrib.groupBy("u").agg(sum(col("c")).as("s")), Seq("u"), "left")
        .select(col("u"),
          (lit(teleport) + expr(s"($dampingPct * coalesce(s, 0)) DIV 100")).as("r"))
    }
    r
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-core extraction: the maximal subgraph in which every vertex keeps
  * degree >= k — the standard density filter for graph-shaped curation
  * (spam farms live in high cores; pendant/chain structure peels away).
  *
  * Algorithm: iterative peeling. Each round computes degrees, drops every
  * vertex below k, and removes its incident edges; the loop ends at the
  * first round that removes nothing (the fixpoint IS the k-core, whatever
  * order vertices peel in — the result is order-independent, which is what
  * makes it oracle-replayable).
  *
  * Scale shape: each round is one degree aggregation (shuffle on the
  * vertex) plus two anti-joins against the weak-vertex set (broadcast-able
  * whenever a round's removals are small, which AQE decides at runtime);
  * the edge set only shrinks. Driver state is one Boolean per round (did
  * anything peel), never vertex data. Rounds are bounded by the peeling
  * depth of the graph — typically tens even on web graphs; `maxRounds`
  * caps the worst case (a long path peels one layer per round) and a
  * capped exit returns the partially-peeled edge set, which is a SUPERSET
  * of the k-core (documented, conservative direction).
  */
object KCore {

  /** @return (u, deg) — vertices of the k-core with their in-core degrees */
  def apply(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 50): DataFrame = {
    require(k >= 1, "k-core needs k >= 1")
    var und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val deg = und.select(explode(array(col("a"), col("b"))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("deg"))
      val weak = deg.where(col("deg") < k).select(col("u")).persist()
      if (weak.count() == 0) { converged = true; weak.unpersist() }
      else {
        val next = und
          .join(weak.select(col("u").as("a")), Seq("a"), "left_anti")
          .join(weak.select(col("u").as("b")), Seq("b"), "left_anti")
          .select(col("a"), col("b"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        und.unpersist(); weak.unpersist()
        und = next
        round += 1
      }
    }
    // the final edge set stays persisted: the returned plan reads it, and
    // unpersisting here would force a full re-peel (every intermediate
    // round has already been unpersisted) when the caller first acts
    und.select(explode(array(col("a"), col("b"))).as("u"))
      .groupBy("u").agg(count(lit(1)).as("deg"))
  }
}

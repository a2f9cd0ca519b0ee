package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs cosine similarity over SPARSE bag-of-terms vectors — the
  * similarity-join complement of the dense-embedding paths
  * (`SimilarityFunctions.cosineTopK` / IVF): here a document is its
  * (term, tf) postings and the join runs off an inverted index, never a
  * per-pair dense scan.
  *
  * Candidate blocking is document-frequency based: only terms whose df is
  * <= `maxDf` generate candidate pairs (the inverted-index self-join runs
  * over rare terms only). This is the deterministic cousin of
  * prefix-filtering in Bayardo et al.'s all-pairs algorithm: a rare shared
  * term is the high-signal evidence of similarity, while ubiquitous terms
  * (stopword-grade, df in the millions at corpus scale) would each
  * contribute a df² candidate quadratic for pairs that are boilerplate-
  * similar at best. The recall CONTRACT is explicit, not sampled: a pair
  * sharing only terms with df > maxDf is excluded by definition, so the
  * capped plan stays oracle-replayable (no silent recall loss — the cap
  * is the documented semantics, same convention as LshBlocking's bucket
  * cap).
  *
  * Scale shape: df aggregation and the rare-term self-join shuffle on the
  * term; per-term join work is bounded by df² <= maxDf² (the cap IS the
  * bucket bound); the exact-dot join then shuffles only the candidate
  * pairs. The dot products are INTEGER (tf counts), so every sum is
  * order-independent and bit-exact cross-engine; the only FP appears in
  * the final `dot / (sqrt(n1)*sqrt(n2))` — two IEEE-exact sqrts, one
  * multiply, one divide — rounded to 6 places on both sides.
  */
object SparseSimJoin {

  /** @param postings one row per (id, term) with an integer `tf` > 0
    * @param maxDf    only terms with df <= maxDf generate candidates
    * @param minCosine keep pairs at or above this cosine (post-exact-dot)
    * @return (id1, id2, dot, cosine) with id1 < id2, cosine rounded to 6
    */
  def apply(postings: DataFrame, idCol: String, termCol: String, tfCol: String,
            maxDf: Int, minCosine: Double): DataFrame = {
    require(maxDf >= 2, "maxDf < 2 generates no candidate pairs")
    val p = postings.select(col(idCol).as("id"), col(termCol).as("term"),
      col(tfCol).cast("long").as("tf"))
    val rare = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf && col("df") >= 2)
      .select(col("term"))
    val rp = p.join(rare, Seq("term"))
    val cand = rp.as("a").join(rp.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    val norms = p.groupBy(col("id")).agg(sum(col("tf") * col("tf")).as("n2"))
    // shuffle_hash on the postings side: the probe side is candidates ×
    // full posting lists — a sort-merge join SORTS that expansion every
    // time (41.8 GB of spill at the x30 soak) while hashing the postings
    // build side is one in-memory table per partition and no sort at all
    val dots = cand
      .join(p.as("x").hint("shuffle_hash"), col("id1") === col("x.id"))
      .join(p.as("y").hint("shuffle_hash"),
        col("id2") === col("y.id") && col("x.term") === col("y.term"))
      .groupBy(col("id1"), col("id2"))
      .agg(sum(col("x.tf") * col("y.tf")).as("dot"))
    dots
      .join(norms.select(col("id").as("id1"), col("n2").as("n2_1")), Seq("id1"))
      .join(norms.select(col("id").as("id2"), col("n2").as("n2_2")), Seq("id2"))
      .select(col("id1"), col("id2"), col("dot"),
        round(col("dot") / (sqrt(col("n2_1")) * sqrt(col("n2_2"))), 6).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}

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

  /** Candidate pairs from the rare-term inverted-index self-join:
    * (id1, id2) with id1 < id2, deduped. */
  private def candidates(p: DataFrame, maxDf: Int): DataFrame = {
    val rare = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf && col("df") >= 2)
      .select(col("term"))
    val rp = p.join(rare, Seq("term"))
    rp.as("a").join(rp.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
  }

  /** @param postings one row per (id, term) with an integer `tf` > 0
    * @param maxDf    only terms with df <= maxDf generate candidates
    * @param minCosine keep pairs at or above this cosine (post-exact-dot)
    * @return (id1, id2, dot, cosine) with id1 < id2, cosine rounded to 6
    *
    * CAVEAT — 60-bit term keys: vectors are packed under the first 60
    * bits of md5(term), so the "exact" dot is exact only up to hash
    * collisions. A collision between two distinct terms IN one document
    * violates the merge kernel's unique-sorted-key assumption; a
    * cross-document collision inflates the dot by treating unrelated
    * terms as shared. Corpus-wide odds are ~V²/2⁶¹ (≈1e-10 at a million
    * terms) and the agreement spec asserts per-document key uniqueness,
    * but a paranoid caller with adversarial term sets should key by the
    * raw term (the [[applyRowJoin]] reference plan) and accept the
    * measured ~35% shuffle premium. */
  def apply(postings: DataFrame, idCol: String, termCol: String, tfCol: String,
            maxDf: Int, minCosine: Double): DataFrame = {
    require(maxDf >= 2, "maxDf < 2 generates no candidate pairs")
    val p = postings.select(col(idCol).as("id"), col(termCol).as("term"),
      col(tfCol).cast("long").as("tf"))
    val cand = candidates(p, maxDf)
    // pack each document ONCE into a term-sorted posting array + its norm;
    // the exact dot is then a row-local codegen'd merge-intersection per
    // candidate pair (exprs.SparseDot). vs the row-join reference plan
    // (candidates × full posting ROWS through two term-equality joins and
    // a pair-group aggregation — [[applyRowJoin]]): the packed form ships
    // each vector as one tight array value through the two id-joins,
    // nothing shuffles per TERM, and the pair aggregation disappears
    // entirely (x30 soak: 85 s / 11.4 GB shuffle / 8 GB spill → see
    // ROUND_NOTES for the re-measured tails).
    // Packed keys are the md5-60-bit term hash (the KMV/bloom convention;
    // oracle-replayable as ('0x'||substr(md5(term),1,15))::BIGINT): 16
    // bytes/entry and primitive compares in the merge, vs ~2-3× that and
    // UTF8 compares for raw trigram strings — the string-keyed first cut
    // measured SLOWER than the row-join plan it meant to replace (114 s
    // vs 85 s at x30, GC-bound on array/string churn). Dot equality with
    // the term-keyed form holds unless two in-doc terms collide in 60
    // bits (~1e-10 corpus-wide), and the oracle hashes the same way, so
    // the gate is exact by construction either way.
    // shuffle_hash on the packed-vector side: a sort-merge join would
    // SORT rows carrying the posting arrays (5.8 GB spill at x10 when
    // first measured); hashing the doc-vector build side keeps the arrays
    // out of every sort buffer
    val termKey = conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long")
    val vecs = p.groupBy(col("id")).agg(
      sort_array(collect_list(struct(termKey.as("h"), col("tf")))).as("v"),
      sum(col("tf") * col("tf")).as("n2")).hint("shuffle_hash")
    cand
      .join(vecs.select(col("id").as("id1"), col("v").as("v1"), col("n2").as("n2_1")), Seq("id1"))
      .join(vecs.select(col("id").as("id2"), col("v").as("v2"), col("n2").as("n2_2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        graft.exprs.SparseDot.dot(col("v1"), col("v2")).as("dot"),
        col("n2_1"), col("n2_2"))
      .select(col("id1"), col("id2"), col("dot"),
        round(col("dot") / (sqrt(col("n2_1")) * sqrt(col("n2_2"))), 6).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** The row-join reference plan (inverted-index candidates, then exact
    * dots via candidates × posting-row term-equality joins + a pair-group
    * sum; shuffle_hash hints keep the expansion sort-free) — the backend
    * the agreement spec pins [[apply]] against. */
  private[graft] def applyRowJoin(postings: DataFrame, idCol: String, termCol: String,
                                  tfCol: String, maxDf: Int, minCosine: Double): DataFrame = {
    require(maxDf >= 2, "maxDf < 2 generates no candidate pairs")
    val p = postings.select(col(idCol).as("id"), col(termCol).as("term"),
      col(tfCol).cast("long").as("tf"))
    val cand = candidates(p, maxDf)
    val norms = p.groupBy(col("id")).agg(sum(col("tf") * col("tf")).as("n2"))
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

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity / approximate-nearest-neighbor operators over an
  * embedding column (`array<float>`), beyond-reference surface for
  * training-data pipelines.
  *
  * Design for scale: dot products are index-wise fold expressions
  * (codegen'd, no UDF); top-k uses a window over candidates produced either
  * by a broadcast cross join (brute force, small query set) or an LSH
  * sign-bucket equi-join (the 100 TB path: candidates shrink by ~2^bits and
  * the join is a plain shuffled equi-join that AQE can re-plan).
  */
object SimilarityFunctions {

  /** Σ a[k]*b[k] — ascending-index left-fold (oracle-stable), compiled to a
    * primitive loop by the custom codegen Expression. */
  def dot(a: Column, b: Column): Column = graft.exprs.DotProduct.dot(a, b)

  /** Interpreted reference path for `dot` (the Scipy-fallback analog);
    * bit-identical fold order — used by the backend-agreement tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket from the signs of the first `bits`
    * components (a deterministic, data-independent hyperplane family). */
  def signBucket(e: Column, bits: Int): Column =
    (0 until bits).map(k => when(get(e, lit(k)) > 0f, lit(1 << k)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Brute-force cosine top-k: every row of `queries` against every row of
    * `corpus` (broadcast the query side — it is the small one). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qe"))
    val c = corpus.select(col(idCol).as("vec_id"), col(embCol).as("ce"))
    val scored = c.join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN top-k: equi-join on the sign bucket, then rank within
    * bucket. Same output columns as brute force; recall < 1 by design. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qe"),
      signBucket(col(embCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("vec_id"), col(embCol).as("ce"),
      signBucket(col(embCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket")).where(col("qid") =!= col("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("ce")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("cos"), col("rank"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch and sampling primitives for corpus-scale statistics. Everything
  * here is built from deterministic md5-derived integer hashes so results
  * are engine-independent (the DuckDB oracles recompute them exactly) and
  * reproducible across cluster re-runs — a property random() sampling does
  * not have and a 100 TB pipeline needs (a re-run after a lost stage must
  * select the same sample).
  *
  * Beyond-reference surface (the reference is single-node in-memory and has
  * no sketches; SURVEY.md §2.8).
  */
object SketchFunctions {

  /** Uniform hash of a key column into [0, 2^60): the first 15 hex digits
    * of md5 as an integer. Plain `functions._` chain — codegen'd, no UDF. */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Small hash in [0, 100) for percentage-based sampling decisions. */
  def hashPct(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** KMV (k-minimum-values) distinct-count sketch per group: keep the k
    * smallest distinct key hashes; estimate |distinct| = (k-1) / max of
    * them, normalized to [0,1). One shuffle on the group keys; the k-min
    * selection is a bounded per-group top-k (rank <= k), so executor state
    * is O(k) per group regardless of input size. */
  def kmvEstimate(df: DataFrame, key: Column, k: Int, groupCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(col("h"))
    df.select(groupCols :+ hash60(key).as("h"): _*)
      .distinct()
      .withColumn("r", row_number().over(w))
      .where(col("r") <= k)
      .groupBy(groupCols: _*)
      .agg(max(col("h")).as("kth"), count(lit(1)).as("k_actual"))
      // 2^60 = 1152921504606846976; estimate only meaningful when the
      // sketch filled (k_actual == k), else the exact count is k_actual
      .withColumn("est_distinct",
        when(col("k_actual") === k,
          round(lit((k - 1).toDouble) * lit(1.152921504606846976e18) / col("kth").cast("double"), 4))
          .otherwise(col("k_actual").cast("double")))
  }

  /** Deterministic Bernoulli sample: keep rows whose key hashes under
    * `pct`. Partition-local, no shuffle, reproducible. */
  def bernoulliSample(df: DataFrame, key: Column, pct: Int): DataFrame =
    df.where(hashPct(key) < pct)

  /** Deterministic stratified sample: per-row keep-percentage from the
    * strata column (training-data mixture weighting). */
  def stratifiedSample(df: DataFrame, key: Column, rate: Column): DataFrame =
    df.where(hashPct(key) < rate)

  /** Count-min sketch build: a depth×width counter grid where every key
    * occurrence increments one counter per row (seeded md5 hashes). The
    * result is `depth*width` rows regardless of input size — the classic
    * mergeable frequency summary for heavy-hitter queries over corpora too
    * large to group exactly. One shuffle on (row, col). */
  def cmsBuild(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame =
    df.select(key.cast("string").as("k"))
      .select(col("k"), explode(array((0 until depth).map(lit): _*)).as("i"))
      .select(col("i"),
        (conv(substring(md5(concat_ws("|", col("i"), col("k"))), 1, 4), 16, 10)
          .cast("long") % width).as("c"))
      .groupBy("i", "c").agg(count(lit(1)).as("cnt"))

  /** Point-query the sketch: estimate(key) = min over rows of the counter
    * the key hashes to. One-sided error: est >= true count, with
    * overestimate bounded by collisions (~2N/width at depth 2). */
  def cmsEstimate(sketch: DataFrame, keys: Seq[String], depth: Int, width: Int): DataFrame = {
    val probes = sketch.sparkSession.range(1)
      .select(explode(typedlit(keys)).as("term"))
      .select(col("term"), explode(array((0 until depth).map(lit): _*)).as("i"))
      .select(col("term"), col("i"),
        (conv(substring(md5(concat_ws("|", col("i"), col("term"))), 1, 4), 16, 10)
          .cast("long") % width).as("c"))
    probes.join(sketch, Seq("i", "c"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-health operators a training-data pipeline runs continuously:
  * distribution-drift scoring between two corpus snapshots and one-pass
  * column profiling (the deequ-style constraint metrics). Beyond-reference
  * surface (the reference is single-array; these are corpus-level).
  */
object ProfileFunctions {

  /** Population Stability Index per group between a reference and a
    * current snapshot: Σ_b (p_cur - p_ref) · ln(p_cur / p_ref) over
    * `buckets` fixed-width value buckets (clamped to the edge buckets, so
    * outliers land in the tails instead of erroring).
    *
    * Laplace smoothing `(cnt + 1) / (n + buckets)` keeps empty buckets
    * defined and deterministic — note a bucket empty on BOTH sides still
    * contributes when the snapshot sizes differ, which is why the full
    * group × bucket grid is materialized (it is quantizer-small by
    * construction: distinct groups × buckets rows). Each bucket term
    * quantizes to 1e-8 and the per-group sum runs in exact BIGINT (the
    * repo's DSIR/BM25 convention), so partition order can never flip the
    * rounded result. Scale shape: two map-side-combined count aggregations
    * over the snapshots; everything after operates on the tiny grid.
    *
    * Returns (group..., n_ref, n_cur, psi). Rule of thumb: psi < 0.1
    * stable, 0.1–0.25 drifting, > 0.25 shifted. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          groupCols: Seq[String], buckets: Int = 10,
          lo: Double = 0.0, width: Double = 50.0): DataFrame = {
    require(buckets > 1 && width > 0)
    def bucketed(d: DataFrame) = d.groupBy(
        groupCols.map(col) :+ bucketOf(col(valueCol), buckets, lo, width).as("b"): _*)
      .agg(count(lit(1)).as("cnt"))
    psiFromCounts(bucketed(ref), bucketed(cur), groupCols, buckets)
  }

  /** The fixed-width clamped bucket id [[psi]] uses — exposed so a
    * streaming source can build its side's counts as the stream's one
    * stateful aggregation and finalize through [[psiFromCounts]]. */
  def bucketOf(value: Column, buckets: Int, lo: Double, width: Double): Column =
    least(greatest(floor((value - lo) / width), lit(0)), lit(buckets - 1)).cast("long")

  /** [[psi]] from pre-aggregated (group..., b, cnt) bucket counts — the
    * finalize step. Both inputs are aggregation outputs (quantizer-small);
    * everything here operates on the tiny group × bucket grid. */
  def psiFromCounts(rc: DataFrame, cc: DataFrame,
                    groupCols: Seq[String], buckets: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val grid = rc.select(gcols: _*).union(cc.select(gcols: _*)).distinct()
      .withColumn("b", explode(sequence(lit(0L), lit(buckets - 1L))))
    val joined = grid
      .join(rc.withColumnRenamed("cnt", "rcnt"), groupCols :+ "b", "left")
      .join(cc.withColumnRenamed("cnt", "ccnt"), groupCols :+ "b", "left")
      .na.fill(0L, Seq("rcnt", "ccnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)
    val withTot = joined
      .withColumn("nr", sum("rcnt").over(w))
      .withColumn("nc", sum("ccnt").over(w))
    val pr = (col("rcnt") + 1) / (col("nr") + buckets)
    val pc = (col("ccnt") + 1) / (col("nc") + buckets)
    // ln(pc/pr) through the integer-ratio identity
    // pc/pr = ((ccnt+1)(nr+B)) / ((rcnt+1)(nc+B)) and the portable
    // polynomial ln (TextFunctions.lnPoly — bit-exact cross-engine, no
    // libm; the quantized-libm form this replaces is the q_dsir_weights
    // failure class). Expanded to the SUM form ln(a·b) = ln a + ln b so no
    // count is ever MULTIPLIED: the product form wraps BIGINT silently at
    // per-group counts ~3e9 (garbage psi, no error) and leaves lnPoly's
    // exact-integer domain past 2^53 (ADVICE r8); each factor here stays
    // well inside both for any realistic corpus. Each bucket term is ≥ 0
    // ((x−y)·ln(x/y) ≥ 0), so floor(x + 0.5) is plain half-up; the
    // per-group sum is exact BIGINT and the reported psi derives from it
    // by one deterministic division.
    val lnr =
      TextFunctions.lnPoly(col("ccnt") + 1) + TextFunctions.lnPoly(col("nr") + buckets) -
      TextFunctions.lnPoly(col("rcnt") + 1) - TextFunctions.lnPoly(col("nc") + buckets)
    withTot
      .withColumn("q8", floor((pc - pr) * lnr * lit(100000000.0) + lit(0.5)).cast("long"))
      .groupBy(gcols: _*)
      .agg(max("nr").as("n_ref"), max("nc").as("n_cur"),
        floor(sum("q8").cast("double") / lit(100.0) + lit(0.5)).cast("long").as("psi_e6"))
      .withColumn("psi", col("psi_e6").cast("double") / lit(1000000.0))
      .drop("psi_e6")
  }

  /** One-pass column profile — the constraint metrics a pipeline asserts
    * before training: row count, completeness, exact distinctness, and
    * typed min/max per column (numeric columns report min_num/max_num,
    * string columns min_str/max_str — native-type ordering, never a
    * lexicographic comparison of numbers). All metrics compute in ONE
    * aggregation over the table (distinct counts via Expand), then pivot
    * to a row per column. */
  def profile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    val all = numCols ++ strCols
    val aggs = all.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
          countDistinct(col(c)).as(s"__nd_$c"))
    } ++ numCols.flatMap { c =>
      Seq(min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c"))
    } ++ strCols.flatMap { c =>
      Seq(min(col(c)).as(s"__sn_$c"), max(col(c)).as(s"__sx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = all.map { c =>
      val isNum = numCols.contains(c)
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"), col(s"__nd_$c").as("n_distinct"),
        round(col(s"__nn_$c") / col("__rows"), 6).as("completeness"),
        (if (isNum) col(s"__mn_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"__mx_$c") else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else col(s"__sn_$c")).as("min_str"),
        (if (isNum) lit(null).cast("string") else col(s"__sx_$c")).as("max_str"))
    }
    row.select(explode(array(stacked: _*)).as("m")).select("m.*")
  }
}

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

  /** Fixed-width histogram over [lo, hi): `bins` buckets, values at or
    * above `hi` clamp into the last bucket, below `lo` into the first —
    * the distribution-summary primitive for corpus reports (quality-score
    * / doc-length histograms). One shuffle on the bucket id (≤ bins
    * groups) after a map-side partial count; empty buckets are emitted
    * with count 0 so the output is always exactly `bins` rows. The bucket
    * rule is plain floor arithmetic (not width_bucket) so an oracle can
    * reproduce it bit-for-bit. */
  def histogram(df: DataFrame, value: Column, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "histogram needs bins >= 1 and hi > lo")
    val b = least(lit(bins - 1), greatest(lit(0),
      floor((value - lit(lo)) / lit(hi - lo) * lit(bins)).cast("int")))
    val counts = df.select(b.as("bucket")).groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val all = df.sparkSession.range(bins).select(col("id").cast("int").as("bucket"))
    all.join(counts, Seq("bucket"), "left")
      .select(col("bucket").cast("long").as("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Deterministic per-group cap: keep at most `k` rows per group, chosen
    * as the k SMALLEST key-hashes — the "at most K documents per
    * domain/language" curation rule, re-run-stable (same keys → same
    * survivors) and unbiased within the group (hash order is uniform).
    * One shuffle on the group key; the rank prunes executor state to
    * O(k) per group via the windowed top-k. */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column], key: Column, k: Int): DataFrame =
    // null keys keep the window form's behavior: a null hash sorted FIRST
    // under Spark's asc-nulls-first, so null-key rows were retained
    // preferentially — map them to (Long.MinValue, "") here (hash60 is
    // 60-bit non-negative, so MinValue sorts strictly before every real
    // key; the empty tie makes the survivors an arbitrary representative
    // set among themselves, exactly like row_number over equal nulls)
    topKPerGroup(df, groupCols,
      coalesce(hash60(key), lit(Long.MinValue)),
      coalesce(key.cast("string"), lit("")), k)

  /** The window form capPerGroup used through r9, kept as the
    * differential-test reference — semantically identical when (ord, tie)
    * is a total order. NOTE (measured, r9): Spark 3.5+ plans the
    * `row_number <= k` filter as a partial WindowGroupLimit below the
    * exchange, so this form's shuffle is just as bounded as the
    * aggregate's; the aggregate path wins on streaming support and
    * single-pass composability, not shuffle bytes (see TopKAgg's doc). */
  private[graft] def capPerGroupWindow(df: DataFrame, groupCols: Seq[Column], key: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(col("__caph"), key.cast("string"))
    df.withColumn("__caph", hash60(key))
      .withColumn("__capr", row_number().over(w))
      .where(col("__capr") <= k)
      .drop("__caph", "__capr")
  }

  /** At most k rows per group — the k smallest (ord, tie) — via the
    * bounded-heap [[graft.exprs.TopKAgg]]: partial aggregation emits at
    * most k entries per group per map task (exchange O(groups·k) — as
    * bounded as Spark 3.5+'s WindowGroupLimit batch plan, but also
    * streaming-capable and composable with sibling aggregates; see
    * TopKAgg's doc for the measured comparison). ord must be BIGINT, tie
    * STRING; (ord, tie) should totally order rows (ties at the k boundary
    * keep an arbitrary representative, exactly like row_number with a
    * non-unique ORDER BY). Output columns = the input's, in order; at
    * most k rows per group. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], ord: Column, tie: Column, k: Int): DataFrame = {
    // the payload struct round-trips rows by FIELD NAME (getField below),
    // so duplicate input columns would silently resolve ambiguously —
    // reject them up front rather than return wrong rows
    require(df.columns.distinct.length == df.columns.length,
      s"topKPerGroup requires distinct column names, got ${df.columns.mkString(", ")}")
    // collision-proof internal aliases: a user column literally named
    // __tk/__row must not capture the getField resolution
    val base = Iterator.from(0).map(i => s"__tk$i").find(n => !df.columns.contains(n)).get
    val rowAlias = Iterator.from(0).map(i => s"__row$i").find(n => !df.columns.contains(n)).get
    val payload = struct(df.columns.map(col): _*)
    df.groupBy(groupCols: _*)
      .agg(graft.exprs.TopKAgg.topK(ord, tie, payload, k).as(base))
      .select(explode(col(base)).as(rowAlias))
      .select(df.columns.map(c => col(rowAlias).getField(c).as(c)): _*)
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

  // ---- HyperLogLog ----

  /** Deterministic HyperLogLog distinct estimate per group, p=4 (16
    * registers). The md5 digest splits into a 4-bit register index (first
    * hex digit) and a 52-bit tail; rho = leading-zero count of the tail
    * + 1, computed EXACTLY via the bit-string length (`bin`, minimal-width
    * on both engines) instead of floating log2.
    *
    * Scale shape: the register build is `groupBy(group, bucket).max(rho)` —
    * a partial-aggregating shuffle whose output is at most 16 rows per
    * group no matter the input size, and registers MERGE by max, so
    * per-partition/per-day sketches union for free (the property a 100 TB
    * rolling-distinct pipeline needs; KMV above shares it). The estimator
    * folds the 16 register terms in ascending sorted order so the FP sum is
    * order-identical cross-engine; empty registers contribute 2^0 = 1 via
    * the exact (m - populated) integer term. */
  def hllEstimate(df: DataFrame, key: Column, groupCols: Seq[Column]): DataFrame =
    hllFinalize(hllRegisters(df, key, groupCols), groupCols)

  /** Register build alone: (group, bucket, reg). A single max-aggregation,
    * so it also runs as a streaming stateful operator (state = at most 16
    * rows per group) — drain the registers, then [[hllFinalize]] in batch:
    * the "sketch in the stream, finalize at read time" split. */
  def hllRegisters(df: DataFrame, key: Column, groupCols: Seq[Column]): DataFrame = {
    val d = md5(key.cast("string"))
    df.select(groupCols
        :+ conv(substring(d, 1, 1), 16, 10).cast("long").as("bucket")
        :+ conv(substring(d, 2, 13), 16, 10).cast("long").as("w"): _*)
      .withColumn("rho",
        when(col("w") === 0, lit(53L)).otherwise(lit(53L) - length(bin(col("w")))))
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(max(col("rho")).as("reg"))
  }

  /** Estimator over built registers (merge partial register sets upstream
    * by max(reg) per (group, bucket) if combining sketches). */
  def hllFinalize(registers: DataFrame, groupCols: Seq[Column]): DataFrame = {
    val m = 16
    registers
      .groupBy(groupCols: _*)
      .agg(
        aggregate(sort_array(collect_list(pow(lit(2.0), -col("reg").cast("double")))),
          lit(0.0), _ + _).as("ssum"),
        count(lit(1)).as("nb"))
      // alpha_16 * m^2 = 0.673 * 256; the 2^8 scaling of the double 0.673
      // is exact, so the constant is bit-identical to DuckDB's
      // 0.673::DOUBLE * 256 (DuckDB's bare 0.673*256 would be DECIMAL)
      .select(groupCols :+ round(
        lit(0.673) * lit(256.0) / (col("ssum") + (lit(m.toLong) - col("nb")).cast("double")),
        4).as("hll_est"): _*)
  }

  /** Approximate quantiles from a deterministic bounded sample: keep the k
    * rows with smallest key-hash per group (a uniform-at-"random" but
    * re-run-stable subset — the KMV selection applied to rows), then take
    * EXACT interpolated quantiles of the sample. Executor state is O(k)
    * per group however large the input; error ~ O(1/sqrt(k)). Both engines
    * define the interpolated quantile as v[lo] + frac*(v[hi]-v[lo]) at
    * index p*(n-1), so with dyadic p and integer-valued data the result is
    * FP-exact cross-engine. */
  def sampledQuantiles(df: DataFrame, key: Column, value: Column, k: Int,
                       groupCols: Seq[Column], ps: Seq[Double]): DataFrame = {
    // ATTEMPTED AND REVERTED (r11): selecting the sample through the
    // bounded-heap TopKAgg instead of this window. First-principles said
    // the heap wins (no map-side sort, O(n log k)); measured it LOST
    // 1.9 s -> 5.3 s steady at sf0.1/32c — the per-row
    // TypedImperativeAggregate cost (UnsafeProjection round-trip + a
    // long->UTF8String tie allocation per input row) dwarfs the radix
    // sort of 600 k longs that WindowGroupLimit actually pays, and the
    // exchange was already bounded to groups*k by the partial limit.
    // Guide §1.1's warning ("a fresh implementation of the ideal plan is
    // usually slower at first") applied verbatim; the window form stays.
    val w = Window.partitionBy(groupCols: _*).orderBy(col("qh"))
    df.select(groupCols :+ hash60(key).as("qh") :+ value.as("v"): _*)
      .withColumn("r", row_number().over(w))
      .where(col("r") <= k)
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as("n_sample"),
        percentile(col("v"), typedlit(ps)).as("qs"))
      .select(groupCols ++ Seq(col("n_sample")) ++
        ps.zipWithIndex.map { case (p, i) =>
          col("qs").getItem(i).as(s"q${(p * 100).round}")
        }: _*)
  }

  // ---- Bloom filter ----

  /** Bit positions (one per seed 0..k-1) a key tests/sets in an m-bit Bloom
    * filter. Pure `functions._` — codegen'd on the probe side. */
  def bloomPositions(key: Column, mbits: Int, k: Int): Seq[Column] =
    (0 until k).map { i =>
      conv(substring(md5(concat_ws("|", lit(i), key.cast("string"))), 1, 13), 16, 10)
        .cast("long") % mbits
    }

  /** Build an m-bit Bloom filter over the distinct keys of `df` as a packed
    * Array[Long]. The bitset is built distributively (`treeAggregate` with
    * bitwise-or merge — a mergeable sketch, no driver-side row loop) and is
    * the right 100 TB decontamination shape: the eval/benchmark side is
    * tiny, so its fixed-size bitset ships to every executor and the corpus
    * side stays a map-only scan — no shuffle, and unlike a broadcast hash
    * set the memory is mbits/8 bytes regardless of eval cardinality. */
  def bloomBuild(df: DataFrame, key: Column, mbits: Int, k: Int): Array[Long] = {
    require(mbits % 64 == 0, s"mbits must be a multiple of 64, got $mbits")
    val words = mbits / 64
    import df.sparkSession.implicits._
    val pos = df.select(explode(array(bloomPositions(key, mbits, k): _*)).as("p"))
      .distinct().as[Long].rdd
    pos.treeAggregate(new Array[Long](words))(
      seqOp = (bits, p) => { bits((p >> 6).toInt) |= 1L << (p & 63); bits },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
  }

  /** Membership test against a built bitset: true iff all k bits are set.
    * The bitset embeds as a literal array in the plan (shipped once per
    * task like a broadcast), and the whole test is builtin expressions —
    * element_at + shiftleft + bitwise-and — inside WholeStageCodegen. */
  def bloomContains(bits: Array[Long], key: Column, mbits: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.catalyst.expressions.ShiftLeft
    val bitsLit = typedlit(bits.toSeq)
    // variable-distance shift: the functions._ shiftleft only takes a
    // literal Int distance, so wrap the Catalyst ShiftLeft directly
    def bit(p: Column): Column = GraftColumnBridge.column(ShiftLeft(
      GraftColumnBridge.expression(lit(1L)),
      GraftColumnBridge.expression((p % 64).cast("int"))))
    bloomPositions(key, mbits, k)
      .map(p => element_at(bitsLit, (p / 64).cast("int") + 1).bitwiseAND(bit(p)) =!= 0)
      .reduce(_ && _)
  }
}

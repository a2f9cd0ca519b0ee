package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance (Levenshtein) similarity join with partition-based
  * blocking — the PassJoin scheme (Li, Deng, Wang, Feng, "PASS-JOIN: a
  * partition-based method for similarity joins", PVLDB 2011), re-expressed
  * as two explodes and one equi-join.
  *
  * Pigeonhole: split every indexed string into d+1 contiguous segments; if
  * ed(a, b) <= d then at least one of b's segments appears UNCHANGED in a,
  * and the net insertions/deletions before it shift its position by at most
  * d. So the indexed side emits its d+1 (length, segment-index, segment)
  * keys, the probe side emits every substring that could match a segment of
  * a string whose length is within ±d — (2d+1) target lengths × (d+1)
  * segments × (2d+1) position shifts, ~(d+1)(2d+1)² keys per row — and the
  * candidate set is their equi-join. No false negatives (the ±d shift
  * window is a superset of PassJoin's tighter position filter), so the
  * residual `levenshtein(a, b) <= d` verification makes the join EXACT:
  * the oracle is the naive all-pairs filter, the blocking is pure plan.
  *
  * Scale shape: both explodes are row-local (O(d²) small strings per row —
  * segments, never the full text), the candidate join is a plain shuffled
  * equi-join on (length, segment-index, segment) that AQE can re-plan for
  * skew, and verification is Spark's codegen'd levenshtein on candidates
  * only. All-pairs never materializes. Strings shorter than d+1 emit
  * empty-string segments — still correct (the key space just degenerates),
  * but a corpus of sub-(d+1)-char strings belongs in a direct broadcast
  * join instead.
  *
  * Returns (id1, id2, dist) for every cross pair with ed <= d; callers
  * slice (e.g. `id1 < id2` for a self-join's unordered pairs).
  */
object FuzzyJoin {

  /** Segment start/length columns for segment `i` of a `p`-partition of a
    * string of length `len`: the first `p - len%p` segments take
    * floor(len/p) chars, the rest one more — one deterministic rule shared
    * by both sides. */
  private def segOf(len: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column, p: Int) = {
    // Column./ is double division — keep the arithmetic integral
    val base = floor(len.cast("int") / lit(p)).cast("int")
    val rem = len.cast("int") % p
    val extraBefore = greatest(lit(0), i - (lit(p) - rem))
    val start = i * base + extraBefore
    val slen = base + when(i >= lit(p) - rem, 1).otherwise(0)
    (start, slen)
  }

  def edJoin(left: DataFrame, right: DataFrame, d: Int,
             leftId: String = "id1", leftStr: String = "s1",
             rightId: String = "id2", rightStr: String = "s2"): DataFrame = {
    require(d >= 1, s"edit-distance threshold must be >= 1, got $d")
    val p = d + 1
    val r = right.select(col(rightId).as("id2"), col(rightStr).as("s2"))
      .withColumn("rlen", length(col("s2")))
      .select(col("id2"), col("s2"), col("rlen"),
        explode(sequence(lit(0), lit(p - 1))).as("i"))
    val (rStart, rLen) = segOf(col("rlen"), col("i"), p)
    // same parallelism guard as the probe side below: either side can be
    // the post-broadcast streamed side, and a single-file source would
    // otherwise run the whole candidate loop on one task
    val rKeys = r.select(col("id2"), col("s2"), col("rlen"), col("i"),
      substring(col("s2"), (rStart + 1).cast("int"), rLen.cast("int")).as("seg"))
      .repartition(math.max(8, right.sparkSession.sparkContext.defaultParallelism))
    val l = left.select(col(leftId).as("id1"), col(leftStr).as("s1"))
      .withColumn("llen", length(col("s1")))
      .select(col("id1"), col("s1"), col("llen"),
        explode(sequence(col("llen") - d, col("llen") + d)).as("rlen"))
      // >= 0, not >= 1: an empty right string is a legitimate neighbor of
      // any left string with llen <= d (its p segments are all empty —
      // the equi-keys (0, i, "") still block correctly)
      .where(col("rlen") >= 0)
      .select(col("id1"), col("s1"), col("llen"), col("rlen"),
        explode(sequence(lit(0), lit(p - 1))).as("i"))
    val (lStart, lLen) = segOf(col("rlen"), col("i"), p)
    val lKeys = l
      .select(col("id1"), col("s1"), col("llen"), col("rlen"), col("i"),
        lStart.as("start"), lLen.as("slen"),
        explode(sequence(lit(-d), lit(d))).as("shift"))
      .withColumn("pos", col("start") + col("shift"))
      .where(col("pos") >= 0 && col("pos") + col("slen") <= col("llen"))
      .select(col("id1"), col("s1"), col("rlen"), col("i"),
        substring(col("s1"), (col("pos") + 1).cast("int"), col("slen").cast("int")).as("seg"))
      .dropDuplicates("id1", "rlen", "i", "seg")
      // round-robin the probe side across the cluster: the probe frame is
      // BYTES-small (AQE coalesces it to ~1 partition after the dedup
      // shuffle) but each probe row of a hot segment bucket drives a large
      // candidate loop in the join — measured 5.0 s single-task vs 0.9 s
      // spread on 32 cores for the 199×15k lev-1 join. An explicit count
      // is exempt from AQE coalescing, and round-robin (not key) spread is
      // deliberate: a hot bucket is ONE key, key-partitioning would
      // re-collapse it onto one task.
      .repartition(math.max(8, left.sparkSession.sparkContext.defaultParallelism))
    // verify BEFORE deduplicating: on low-entropy corpora (shared prefixes
    // — e.g. "Customer#000…" keys) one segment bucket can collide a large
    // slice of both sides, and shuffling those candidate rows (with both
    // strings) into a dropDuplicates costs far more than verifying them
    // in the map stage. The threshold form of levenshtein early-exits at
    // d (O(d·len) per pair, returns -1 past the bound), so only TRUE
    // pairs — a set bounded by the output — reach the final exactly-once
    // shuffle. A pair that collides in several buckets yields identical
    // (id1, id2, dist) rows, so dedup after the filter is equivalent.
    lKeys.join(rKeys, Seq("rlen", "i", "seg"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), d))
      .where(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
      .dropDuplicates("id1", "id2")
  }
}

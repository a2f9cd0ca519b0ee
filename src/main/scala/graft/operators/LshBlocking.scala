package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared plumbing for LSH-style banded self-joins — the candidate
  * generation behind minhash/simhash/edit-distance near-dup queries.
  *
  * Two guards make the band join safe on a 100 TB boilerplate-heavy corpus
  * (where thousands of byte-identical or near-identical docs share a
  * shingle-min and a naive `bands ⋈ bands ON h=h` goes quadratic inside
  * one bucket):
  *
  *  1. [[collapseExact]] — byte-identical documents collapse to one
  *     representative (min id per content hash) BEFORE signatures are
  *     computed: exact dups are the most common near-dup candidate and
  *     contribute nothing but bucket blowup (they pair with everything
  *     their content pairs with). The exact-dup groups are recovered
  *     relationally afterwards (join on the content hash), so no
  *     information is lost — only the quadratic is gone.
  *  2. [[cappedBands]] — buckets wider than `cap` are dropped entirely,
  *     the standard recall-vs-blowup dial (a bucket shared by B docs
  *     yields B·(B-1)/2 candidates; a cap bounds per-bucket work to
  *     cap²/2). [[droppedBuckets]] reports what the cap discarded so
  *     callers can log it — a silent cap would read as full recall.
  *
  * Deterministic by construction (count-based cap, no sampling), so the
  * capped plans stay oracle-gateable.
  */
object LshBlocking {

  /** One representative row (min `idCol`) per distinct `textCol` content.
    * The semi-join keeps the full row of each representative; at scale this
    * is a shuffle on the content hash then on the id — both narrow. */
  def collapseExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kept = docs.groupBy(md5(col(textCol)).as("content_h"))
      .agg(min(col(idCol)).as(idCol))
    docs.join(kept.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** `(idCol -> representative idCol)` mapping for every input row — the
    * re-expansion side of [[collapseExact]]. */
  def repMapping(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kept = docs.groupBy(md5(col(textCol)).as("content_h"))
      .agg(min(col(idCol)).as("rep_id"))
    docs.select(col(idCol), md5(col(textCol)).as("content_h"))
      .join(kept, Seq("content_h"))
      .select(col(idCol), col("rep_id"))
  }

  /** Band rows with buckets wider than `cap` removed. One extra (tiny)
    * aggregation shuffle buys a hard bound on the self-join's per-bucket
    * quadratic. */
  def cappedBands(bands: DataFrame, bandCol: String, hCol: String, cap: Int): DataFrame = {
    val sizes = bands.groupBy(col(bandCol), col(hCol))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") <= cap)
    bands.join(sizes, Seq(bandCol, hCol)).drop("bucket_n")
  }

  /** The buckets a given `cap` would discard, with their widths — count or
    * collect this and log it next to the capped join (no silent caps). */
  def droppedBuckets(bands: DataFrame, bandCol: String, hCol: String, cap: Int): DataFrame =
    bands.groupBy(col(bandCol), col(hCol))
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > cap)

  /** Banded self-join over cap-filtered buckets: one output row per
    * (band, bucket) co-occurrence with `id1 < id2`; `carry` columns are
    * duplicated as `<c>_1` / `<c>_2`. Callers `groupBy(id1, id2)` to count
    * shared bands or `.distinct()` for the candidate set. */
  def candidatePairs(bands: DataFrame, bandCol: String, hCol: String, idCol: String,
                     cap: Int, carry: Seq[String] = Nil): DataFrame = {
    val kept = cappedBands(bands, bandCol, hCol, cap)
    val joined = kept.as("x").join(kept.as("y"),
      col(s"x.$hCol") === col(s"y.$hCol") && col(s"x.$bandCol") === col(s"y.$bandCol") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
    val cols = Seq(col(s"x.$idCol").as("id1"), col(s"y.$idCol").as("id2")) ++
      carry.flatMap(c => Seq(col(s"x.$c").as(s"${c}_1"), col(s"y.$c").as(s"${c}_2")))
    joined.select(cols: _*)
  }

  /** EXACT hamming-distance self-pairs over an integer fingerprint column
    * via pigeonhole band blocking — the hand-callable twin of
    * [[graft.plans.HammingJoinRewrite]] (same r+1 disjoint-bit-range
    * split; a pair at distance <= r is bit-identical on at least one
    * band, so the plan is one equi-join on (band, value) plus the exact
    * popcount residual — never all-pairs). Unlike the optimizer rule,
    * a hand-built op HAS row identity, so exactly-once is a plain
    * distinct over (id1, id2). Complete for any `r` in [1, bits-1]; ids
    * must be unique. Returns (id1, id2, hamming) with id1 < id2.
    *
    * Scale shape: fan-out r+1 rows per fingerprint, one shuffled (or
    * broadcast) equi-join; band-collision work is C(B,2) per bucket like
    * every LSH join here — for adversarially hot fingerprint values,
    * collapse exact dups first ([[collapseExact]] on the fingerprint). */
  def hammingPairs(df: DataFrame, idCol: String, fpCol: String, r: Int): DataFrame = {
    import org.apache.spark.sql.types._
    // band width must match the fingerprint's ACTUAL bit width: treating a
    // Short/Byte fingerprint as 32-bit would make every band above the
    // type's width constant zero — those bands collide for ALL rows and
    // the banded join silently degrades to a near-cross-join (ADVICE r8);
    // non-integral types must fail here, not inside the expression tree
    val bits = df.schema(fpCol).dataType match {
      case LongType => 64
      case IntegerType => 32
      case ShortType => 16
      case ByteType => 8
      case other => throw new IllegalArgumentException(
        s"hammingPairs fingerprint column '$fpCol' must be an integral type " +
          s"(TINYINT/SMALLINT/INT/BIGINT), got ${other.sql}")
    }
    val isLong = bits == 64
    require(r >= 1 && r < bits, s"hamming radius $r outside [1, ${bits - 1}]")
    val p = r + 1
    val ranges = graft.plans.HammingBands.ranges(bits, p)
    val bandStructs = ranges.zipWithIndex.map { case ((start, w), i) =>
      val mask =
        if (isLong) lit(if (w >= 64) -1L else (1L << w) - 1L)
        else lit(if (w >= 32) -1 else (1 << w) - 1)
      struct(lit(i).as("bi"),
        (shiftrightunsigned(col("h"), start) bitwiseAND mask).as("bv"))
    }
    // sub-int fingerprints sign-extend when coerced for the bit ops; band
    // values stay below the type width so bands are safe, but the XOR
    // popcount would count the 16/24 phantom sign bits of a mixed-sign
    // pair — mask the XOR back to the type's width
    val xorBits = {
      val raw = col("x.h").bitwiseXOR(col("y.h"))
      if (bits < 32) raw.cast("int") bitwiseAND lit((1 << bits) - 1) else raw
    }
    val bands = df.select(col(idCol).as("hid"), col(fpCol).as("h"))
      .select(col("hid"), col("h"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("hid"), col("h"), col("bk.bi").as("bi"), col("bk.bv").as("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.bi") === col("y.bi") && col("x.bv") === col("y.bv") &&
          col("x.hid") < col("y.hid"))
      .select(col("x.hid").as("id1"), col("y.hid").as("id2"),
        bit_count(xorBits).cast("int").as("hamming"))
      .where(col("hamming") <= r)
      .distinct()
  }
}

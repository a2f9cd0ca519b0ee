package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Graft

/** Facade contracts for the round-6 pipeline additions: span removal,
  * gap fill, weighted sampling, KMV set ops, entropy, image aHash. The
  * oracle gates check engine-equivalence on real data; these pin the
  * semantic contracts on adversarial micro-inputs. */
class CorpusOpsSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  test("funnel counts only in-order in-window completions") {
    // u1 completes all three in order; u2 clicks BEFORE viewing (must not
    // count past stage 1); u3 views then clicks outside the window; u4
    // only views. Window = 100 ns.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 50L), (2L, "purchase", 60L),
      (3L, "view", 10L), (3L, "click", 500L),
      (4L, "view", 40L)).toDF("user_id", "event_type", "ts")
    val r = Graft.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowNs = 100L)
      .orderBy("stage").as[(Int, Long, Long)].collect().toSeq
    // stage 1: u1,u2,u3,u4; stage 2: u1 (+u2? u2 has no click at/after
    // its first view) -> u1 only; stage 3: u1
    assert(r == Seq((1, 4L, 10000L), (2, 1L, 2500L), (3, 1L, 2500L)), s"got $r")
  }

  test("funnel with an empty first stage reports conv 0, not null") {
    // ADVICE r8: integer div-by-zero on n_first would null conv_e4
    val ev = Seq((1L, "click", 20L), (2L, "purchase", 30L))
      .toDF("user_id", "event_type", "ts")
    val r = Graft.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowNs = 100L)
      .orderBy("stage").as[(Int, Long, Long)].collect().toSeq
    assert(r == Seq((1, 0L, 0L), (2, 0L, 0L), (3, 0L, 0L)), s"got $r")
  }

  test("retentionCohorts counts distinct active users per offset") {
    // bucket = 10 ns; u1 first at bucket 1, active 1,2,2(dup); u2 first at
    // bucket 1, active 1 only; u3 first at bucket 2, active 2,5 (offset 3)
    val ev = Seq(
      (1L, 10L), (1L, 20L), (1L, 25L),
      (2L, 15L),
      (3L, 20L), (3L, 50L)).toDF("user_id", "ts")
    val r = Graft.retentionCohorts(ev, "user_id", "ts", bucketNs = 10L, maxOffset = 3)
      .orderBy("cohort", "offset").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 0L, 2L, 2L, 10000L), // cohort 1: both active at offset 0
      (1L, 1L, 1L, 2L, 5000L),  // only u1 at offset 1
      (2L, 0L, 1L, 1L, 10000L), // cohort 2: u3
      (2L, 3L, 1L, 1L, 10000L)), s"got $r")
  }

  test("removeDuplicatedSpans drops exactly the covered tokens, both copies") {
    val docs = Seq(
      (1L, "a b c d e x1 y1 z1"), // shares "a b c d e" with doc 2
      (2L, "p2 a b c d e q2"),
      (3L, "solo words only here")).toDF("doc_id", "text")
    val r = Graft.removeDuplicatedSpans(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect()
    assert(r(0) == ((1L, "x1 y1 z1", 8, 5)))
    assert(r(1) == ((2L, "p2 q2", 7, 5)))
    assert(r(2) == ((3L, "solo words only here", 4, 0)))
  }

  test("removeDuplicatedSpans covers overlapping gram spans as one run") {
    // docs share a 6-token run => two overlapping 5-gram starts; covered
    // positions must union, not double-count
    val docs = Seq(
      (1L, "a b c d e f tail1"),
      (2L, "a b c d e f tail2")).toDF("doc_id", "text")
    val r = Graft.removeDuplicatedSpans(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Int, Int)].collect()
    assert(r(0) == ((1L, "tail1", 7, 6)))
    assert(r(1) == ((2L, "tail2", 7, 6)))
  }

  test("gapFill materializes missing buckets and carries the last value") {
    val events = Seq(
      (7L, 0L, 10.0),              // bucket 0
      (7L, 3L * 100L, 4.5),        // bucket 3 (bucketNs = 100)
      (9L, 100L, 1.0)              // single-bucket key: no gaps
    ).toDF("k", "ts", "v")
    val r = Graft.gapFill(events, "k", "ts", "v", 100L)
      .orderBy("k", "bucket").as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      (7L, 0L, 1L, 10.0), (7L, 1L, 0L, 10.0), (7L, 2L, 0L, 10.0),
      (7L, 3L, 1L, 4.5), (9L, 1L, 1L, 1.0)))
  }

  test("gapFill fills gaps under a BinaryType key (deepEquals, not reference eq)") {
    // Array[Byte] keys compare by reference under ==; the run detection
    // must use deepEquals or every row looks like a new key (ADVICE r10)
    val events = Seq(
      (Array[Byte](1, 2), 0L, 10.0),
      (Array[Byte](1, 2), 3L * 100L, 4.5)
    ).toDF("k", "ts", "v")
    val r = Graft.gapFill(events, "k", "ts", "v", 100L)
      .orderBy("bucket").select("bucket", "n_events", "filled_value")
      .as[(Long, Long, Double)].collect()
    assert(r.toSeq == Seq((0L, 1L, 10.0), (1L, 0L, 10.0), (2L, 0L, 10.0), (3L, 1L, 4.5)))
  }

  test("weightedSample is re-run stable, k-bounded, and weight-biased") {
    val df = (1 to 400).map(i => (i.toLong, if (i % 2 == 0) 1000.0 else 1.0))
      .toDF("id", "w").withColumn("g", lit("all"))
    val s1 = Graft.weightedSample(df, Seq(col("g")), col("id"), col("w"), 20)
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Graft.weightedSample(df, Seq(col("g")), col("id"), col("w"), 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 == s2 && s1.size == 20)
    // weight 1000 vs 1: heavy ids (even) should dominate the sample
    assert(s1.count(_ % 2 == 0) >= 18, s"heavy=${s1.count(_ % 2 == 0)}")
  }

  test("kmvSetOps: identical sets give jaccard 1, disjoint sets 0") {
    val a = (1 to 500).toDF("k")
    val same = Graft.kmvSetOps(a, col("k"), a, col("k"), k = 64)
      .select("jaccard").as[Double].head()
    assert(same == 1.0)
    val b = (1001 to 1500).toDF("k")
    val disj = Graft.kmvSetOps(a, col("k"), b, col("k"), k = 64)
      .select("jaccard").as[Double].head()
    assert(disj == 0.0)
    // half-overlap: estimate within 3 sigma of J=1/3 (k=64 -> se ~ 6%)
    val c = (251 to 750).toDF("k")
    val half = Graft.kmvSetOps(a, col("k"), c, col("k"), k = 64)
      .select("jaccard").as[Double].head()
    assert(half > 0.33 - 0.18 && half < 0.33 + 0.18, s"jaccard=$half")
  }

  test("charEntropy: single-symbol text is 0, uniform k-symbol text is log2 k") {
    val docs = Seq((1L, "aaaaaaaa"), (2L, "abcdabcd")).toDF("doc_id", "text")
    val r = Graft.charEntropy(docs, "doc_id", "text").orderBy("doc_id")
      .select("char_entropy").as[Double].collect()
    assert(math.abs(r(0)) < 1e-12)
    assert(math.abs(r(1) - 2.0) < 1e-12)
  }

  test("averageHash64 sets exactly the above-mean bits") {
    // constant frame: no pixel strictly above the mean -> zero hash
    assert(graft.multimodal.Multimodal.averageHash64(Array.fill(64)(5.0)) == ((0L, 0L)))
    // one hot pixel at index 0: only bit 0 set
    val px = Array.fill(64)(0.0); px(0) = 255.0
    assert(graft.multimodal.Multimodal.averageHash64(px) == ((1L, 0L)))
    // hot pixel at index 63: only top bit of the hi word
    val px2 = Array.fill(64)(0.0); px2(63) = 255.0
    assert(graft.multimodal.Multimodal.averageHash64(px2) == ((0L, 1L << 31)))
  }

  test("imageNearDupPairs finds identical payloads at hamming 0") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val payloads = Seq(
      (1L, "the same payload bytes"),
      (2L, "the same payload bytes"),
      (3L, "completely different data stream with other stats ZZZZ")
    ).toDF("id", "s").select(col("id"), col("s").cast("binary").as("payload"))
    val pairs = Graft.imageNearDupPairs(payloads, "id", "payload")
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}

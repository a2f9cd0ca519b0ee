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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SketchFunctions

/** Bounded-heap per-group top-k (exprs.TopKAgg): differential vs the
  * row_number window form across multi-partition inputs (which forces the
  * partial/merge path and buffer serialization through the partial
  * exchange), boundary and null contracts, and the capPerGroup migration
  * (new aggregate path bit-equal to the r9 window path). */
class TopKAggSpec extends AnyFunSuite {
  private val spark = SharedSpark.spark
  import spark.implicits._

  private def seededRows(n: Int): Seq[(String, Long, String, Int)] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toLong, s"t${rnd.nextInt(1000)}_$i", i)
    }
  }

  test("topKPerGroup matches the row_number window on a multi-partition frame") {
    // tie column is made unique per row (suffix _i) so (ord, tie) is a
    // total order — the determinism contract both forms share
    val df = seededRows(500).toDF("g", "o", "t", "payload").repartition(7)
    val fast = SketchFunctions.topKPerGroup(df, Seq(col("g")), col("o"), col("t"), 7)
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("o"), col("t"))
    val slow = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 7)
      .drop("rn").collect().map(_.toSeq).toSet
    assert(fast == slow)
  }

  test("k larger than every group returns all rows") {
    val df = seededRows(60).toDF("g", "o", "t", "payload").repartition(3)
    val out = SketchFunctions.topKPerGroup(df, Seq(col("g")), col("o"), col("t"), 1000)
    assert(out.count() == 60)
    assert(out.collect().map(_.toSeq).toSet == df.collect().map(_.toSeq).toSet)
  }

  test("boundary ties keep exactly k rows per group") {
    // every row of a group shares (ord, tie): the k survivors are an
    // arbitrary representative set, but the COUNT contract is exact
    val df = (0 until 40).map(i => (s"g${i % 2}", 1L, "same", i))
      .toDF("g", "o", "t", "payload").repartition(5)
    val out = SketchFunctions.topKPerGroup(df, Seq(col("g")), col("o"), col("t"), 3)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(out == Map("g0" -> 3L, "g1" -> 3L))
  }

  test("null ord rows are ignored; null tie sorts as empty string") {
    val df = Seq(
      ("g", Some(2L), "b", 1), ("g", None, "ignored", 2),
      ("g", Some(2L), null.asInstanceOf[String], 3), ("g", Some(1L), "a", 4)
    ).toDF("g", "o", "t", "payload")
    val out = SketchFunctions.topKPerGroup(df, Seq(col("g")), col("o"), col("t"), 2)
      .select("payload").as[Int].collect().toSet
    // kept: ord=1 ("a") and ord=2 with null tie (empty < "b"); the null-ord
    // row can never appear
    assert(out == Set(4, 3))
  }

  test("capPerGroup (aggregate path) is bit-equal to the r9 window path") {
    val df = seededRows(300).toDF("g", "o", "t", "payload")
      .select(col("g"), col("t").as("key"), col("payload")).repartition(6)
    val a = SketchFunctions.capPerGroup(df, Seq(col("g")), col("key"), 9)
      .collect().map(_.toSeq).toSet
    val b = SketchFunctions.capPerGroupWindow(df, Seq(col("g")), col("key"), 9)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("capPerGroup keeps null-key rows preferentially, like the window form") {
    // the window form sorted the null hash FIRST (asc-nulls-first), so
    // null-key rows were retained ahead of every real key — the aggregate
    // path maps them to (Long.MinValue, "") to preserve that. With m >= k
    // null-key rows per group, ALL survivors are null-key on both paths.
    val df = (0 until 30).map { i =>
      val g = s"g${i % 2}"
      if (i < 10) (g, null.asInstanceOf[String], i) else (g, s"key$i", i)
    }.toDF("g", "key", "payload").repartition(4)
    val a = SketchFunctions.capPerGroup(df, Seq(col("g")), col("key"), 4)
      .select("key").collect().map(_.isNullAt(0))
    val b = SketchFunctions.capPerGroupWindow(df, Seq(col("g")), col("key"), 4)
      .select("key").collect().map(_.isNullAt(0))
    assert(a.length == 8 && a.forall(identity), s"agg survivors: ${a.count(identity)}/8 null")
    assert(b.length == 8 && b.forall(identity), s"window survivors: ${b.count(identity)}/8 null")
  }

  test("duplicate column names are rejected; __tk/__row user columns don't collide") {
    // duplicate names would make the by-name payload getField ambiguous —
    // the API rejects them up front (ADVICE r9)
    val dup = Seq((1, 2)).toDF("a", "a")
    assertThrows[IllegalArgumentException](
      SketchFunctions.topKPerGroup(dup, Seq(col("a")), lit(1L), lit(""), 1))
    // a user column named like the old internal aliases must round-trip
    val tricky = Seq(("g1", 3L, "x", "tk"), ("g1", 1L, "y", "row"), ("g2", 2L, "z", "q"))
      .toDF("g", "o", "__tk", "__row")
    val out = SketchFunctions.topKPerGroup(tricky, Seq(col("g")), col("o"), col("__tk"), 1)
      .collect().map(_.toSeq).toSet
    assert(out == Set(Seq("g1", 1L, "y", "row"), Seq("g2", 2L, "z", "q")))
  }

  test("struct payload with a nested array survives the buffer roundtrip") {
    val df = seededRows(100).toDF("g", "o", "t", "payload")
      .withColumn("arr", array(col("payload"), col("payload") * 2))
      .repartition(4)
    val out = SketchFunctions.topKPerGroup(df, Seq(col("g")), col("o"), col("t"), 4)
    val rows = out.select("payload", "arr").as[(Int, Seq[Int])].collect()
    assert(rows.nonEmpty && rows.forall { case (p, a) => a == Seq(p, p * 2) })
  }
}

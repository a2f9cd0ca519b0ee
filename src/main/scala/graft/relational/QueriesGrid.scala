package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TensorFunctions._

/** 2-D kernel queries: a 16x16 grid image is assembled in-query from
  * `events` (cell (i,j) = user_id%16, event_id%16), one row = one tensor,
  * and the real n-d kernels (stencil morphology, EDT, zoom, radon, label)
  * run on it; the oracle recomputes the same op relationally in DuckDB
  * (neighbor joins / cross-join min / 4-corner bilinear / circle-clipped
  * column sums). This is the differential-testing pattern of the reference
  * (scipy oracles, /root/reference/tests/) transplanted to the t2 gate.
  */
object QueriesGrid {

  private val N = 16

  /** value-sum grid: v(i,j) = round(sum(value),2), absent cells 0. */
  private def valueGrid(s: SparkSession, dir: String): DataFrame = {
    val cells = T(s, dir, "events")
      .groupBy((col("user_id") % N).as("i"), (col("event_id") % N).as("j"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    val ij = s.range(N).select(col("id").as("i"))
      .crossJoin(s.range(N).select(col("id").as("j")))
    ij.join(cells, Seq("i", "j"), "left").na.fill(0.0, Seq("v"))
  }

  private val valueGridCte =
    s"""cells AS (SELECT user_id % $N AS i, event_id % $N AS j, cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS v
       |  FROM events GROUP BY user_id % $N, event_id % $N),
       |grid AS (SELECT r1.i AS i, r2.j AS j, coalesce(c.v, 0.0) AS v
       |  FROM range($N) r1(i) CROSS JOIN range($N) r2(j)
       |  LEFT JOIN cells c ON c.i = r1.i AND c.j = r2.j)""".stripMargin

  /** boolean grid: m(i,j) = any event with value > 300. */
  private def maskGrid(s: SparkSession, dir: String): DataFrame = {
    val cells = T(s, dir, "events")
      .groupBy((col("user_id") % N).as("i"), (col("event_id") % N).as("j"))
      .agg(max(when(col("value") > 300.0, 1).otherwise(0)).as("v"))
    val ij = s.range(N).select(col("id").as("i"))
      .crossJoin(s.range(N).select(col("id").as("j")))
    ij.join(cells, Seq("i", "j"), "left").na.fill(0, Seq("v"))
  }

  private val maskGridCte =
    s"""cells AS (SELECT user_id % $N AS i, event_id % $N AS j,
       |  max(CASE WHEN value > 300.0 THEN 1 ELSE 0 END) AS v
       |  FROM events GROUP BY user_id % $N, event_id % $N),
       |grid AS (SELECT r1.i AS i, r2.j AS j, coalesce(c.v, 0) AS v
       |  FROM range($N) r1(i) CROSS JOIN range($N) r2(j)
       |  LEFT JOIN cells c ON c.i = r1.i AND c.j = r2.j)""".stripMargin

  /** Collapse a grid DF into one row: row-major array ordered by (i, j). */
  private def toTensor(grid: DataFrame, asBool: Boolean): DataFrame =
    grid.agg(transform(array_sort(collect_list(struct(col("i"), col("j"), col("v")))),
      x => if (asBool) x.getField("v") === 1 else x.getField("v").cast("double")).as("data"))

  /** Explode a row-major array back to (i, j, value) rows. */
  private def explodeGrid(t: DataFrame, valueCol: String, n: Int): DataFrame =
    t.select(posexplode(col(valueCol)).as(Seq("pos", "out")))
      .select((col("pos") / n).cast("long").as("i"), (col("pos") % n).cast("long").as("j"), col("out"))

  val queries: Seq[Q] = Seq(

    Q("q_erosion2d",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(erodeUdf(col("data"), array(lit(N), lit(N))).as("e")),
          "e", N)
        .select(col("i"), col("j"), when(col("out"), 1).otherwise(0).as("e")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 1
              |  AND coalesce(u.v, 1) = 1 AND coalesce(d.v, 1) = 1
              |  AND coalesce(l.v, 1) = 1 AND coalesce(r.v, 1) = 1 THEN 1 ELSE 0 END AS e
              |FROM grid g
              |LEFT JOIN grid u ON u.i = g.i - 1 AND u.j = g.j
              |LEFT JOIN grid d ON d.i = g.i + 1 AND d.j = g.j
              |LEFT JOIN grid l ON l.i = g.i AND l.j = g.j - 1
              |LEFT JOIN grid r ON r.i = g.i AND r.j = g.j + 1""".stripMargin)),

    Q("q_dilation2d",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(dilateUdf(col("data"), array(lit(N), lit(N))).as("e")),
          "e", N)
        .select(col("i"), col("j"), when(col("out"), 1).otherwise(0).as("e")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 1
              |  OR coalesce(u.v, 0) = 1 OR coalesce(d.v, 0) = 1
              |  OR coalesce(l.v, 0) = 1 OR coalesce(r.v, 0) = 1 THEN 1 ELSE 0 END AS e
              |FROM grid g
              |LEFT JOIN grid u ON u.i = g.i - 1 AND u.j = g.j
              |LEFT JOIN grid d ON d.i = g.i + 1 AND d.j = g.j
              |LEFT JOIN grid l ON l.i = g.i AND l.j = g.j - 1
              |LEFT JOIN grid r ON r.i = g.i AND r.j = g.j + 1""".stripMargin)),

    // even (2x2) footprint: erosion origin = fshape//2 = (1,1) so the
    // support is {-1,0}^2; dilation reflects and shifts even origins by -1
    // (origin (0,0)) so the support is {+0,+1}^2 (_morphology.pyx:62-64)
    Q("q_erosion2d_even",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(morphUdf(col("data"), array(lit(N), lit(N)),
              array(lit(true), lit(true), lit(true), lit(true)), array(lit(2), lit(2)),
              lit(false)).as("e")),
          "e", N)
        .select(col("i"), col("j"), when(col("out"), 1).otherwise(0).as("e")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 1
              |  AND coalesce(a.v, 1) = 1 AND coalesce(b.v, 1) = 1 AND coalesce(c.v, 1) = 1
              |  THEN 1 ELSE 0 END AS e
              |FROM grid g
              |LEFT JOIN grid a ON a.i = g.i - 1 AND a.j = g.j - 1
              |LEFT JOIN grid b ON b.i = g.i - 1 AND b.j = g.j
              |LEFT JOIN grid c ON c.i = g.i AND c.j = g.j - 1""".stripMargin)),

    Q("q_dilation2d_even",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(morphUdf(col("data"), array(lit(N), lit(N)),
              array(lit(true), lit(true), lit(true), lit(true)), array(lit(2), lit(2)),
              lit(true)).as("e")),
          "e", N)
        .select(col("i"), col("j"), when(col("out"), 1).otherwise(0).as("e")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 1
              |  OR coalesce(a.v, 0) = 1 OR coalesce(b.v, 0) = 1 OR coalesce(c.v, 0) = 1
              |  THEN 1 ELSE 0 END AS e
              |FROM grid g
              |LEFT JOIN grid a ON a.i = g.i + 1 AND a.j = g.j + 1
              |LEFT JOIN grid b ON b.i = g.i + 1 AND b.j = g.j
              |LEFT JOIN grid c ON c.i = g.i AND c.j = g.j + 1""".stripMargin)),

    Q("q_edt2d",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(edtUdf(col("data"), array(lit(N), lit(N)), array(lit(1.0), lit(1.0))).as("e")),
          "e", N)
        .select(col("i"), col("j"), round(col("out"), 4).as("dist")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 0 THEN 0.0 ELSE
              |  round(sqrt(min((g.i - z.i)*(g.i - z.i) + (g.j - z.j)*(g.j - z.j))), 4) END AS dist
              |FROM grid g JOIN grid z ON z.v = 0
              |GROUP BY g.i, g.j, g.v""".stripMargin)),

    // distributed separable EDT (per-axis line passes) against the same
    // relational oracle as the single-tensor q_edt2d
    Q("q_edt2d_dist",
      (s, dir) => graft.operators.DistributedEdt(
          maskGrid(s, dir).select(col("i"), col("j"), (col("v") === 1).as("mask")))
        .select(col("i"), col("j"),
          when(col("dist") > 1e49, lit(0.0)) // all-true line guard (no zeros)
            .otherwise(round(col("dist"), 4)).as("dist")),
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 0 THEN 0.0 ELSE
              |  round(sqrt(min((g.i - z.i)*(g.i - z.i) + (g.j - z.j)*(g.j - z.j))), 4) END AS dist
              |FROM grid g JOIN grid z ON z.v = 0
              |GROUP BY g.i, g.j, g.v""".stripMargin)),

    Q("q_zoom2d",
      (s, dir) => explodeGrid(
          toTensor(valueGrid(s, dir), asBool = false)
            .select(zoomUdf(col("data"), array(lit(N), lit(N)),
              array(lit(0.5), lit(0.5)), lit(1), lit(0.0)).as("z"))
            .select(col("z").getField("_1").as("zd")),
          "zd", N / 2)
        .select(col("i"), col("j"), round(col("out"), 4).as("v")),
      Some {
        // source coordinate for output index a: a * ((16-1)/(8-1))
        def c(x: String) = s"($x * (15.0 / 7.0))"
        def f(x: String) = s"floor(${c(x)})"
        def pix(ri: String, ci: String) =
          s"coalesce(d[CASE WHEN $ri BETWEEN 0 AND ${N - 1} AND $ci BETWEEN 0 AND ${N - 1} " +
            s"THEN cast($ri * $N + $ci AS INT) + 1 ELSE NULL END], 0.0)"
        val (fa, fb) = (s"cast(${f("ra.a")} AS INT)", s"cast(${f("rb.b")} AS INT)")
        val (da, db) = (s"(${c("ra.a")} - ${f("ra.a")})", s"(${c("rb.b")} - ${f("rb.b")})")
        s"""WITH $valueGridCte,
           |g AS (SELECT list(v ORDER BY i, j) AS d FROM grid)
           |SELECT ra.a AS i, rb.b AS j, round(
           |  (1.0 * (1 - $da) * (1 - $db)) * ${pix(fa, fb)}
           |+ (1.0 * $da * (1 - $db)) * ${pix(s"($fa + 1)", fb)}
           |+ (1.0 * (1 - $da) * $db) * ${pix(fa, s"($fb + 1)")}
           |+ (1.0 * $da * $db) * ${pix(s"($fa + 1)", s"($fb + 1)")}, 4) AS v
           |FROM range(${N / 2}) ra(a) CROSS JOIN range(${N / 2}) rb(b) CROSS JOIN g""".stripMargin
      }),

    Q("q_radon_axis",
      (s, dir) => {
        // zero outside the inscribed circle so the reference's validation
        // (radon.py:73-87) passes, then run the real kernel at theta=0
        val circled = valueGrid(s, dir).select(col("i"), col("j"),
          when((col("i") - 8) * (col("i") - 8) + (col("j") - 8) * (col("j") - 8) > 64, 0.0)
            .otherwise(col("v")).as("v"))
        toTensor(circled, asBool = false)
          .select(radonUdf(col("data"), lit(N), array(lit(0.0))).as("sino"))
          .select(posexplode(col("sino")).as(Seq("offset", "val")))
          .select(col("offset").cast("long").as("offset"), round(col("val"), 4).as("val"))
      },
      Some(s"""WITH $valueGridCte,
              |cg AS (SELECT i, j, CASE WHEN (i-8)*(i-8) + (j-8)*(j-8) > 64 THEN 0.0 ELSE v END AS v
              |  FROM grid),
              |lim AS (SELECT j, count(CASE WHEN (i-8)*(i-8) + (j-8)*(j-8) > 100 THEN 1 END) // 2 AS l
              |  FROM cg GROUP BY j)
              |SELECT cg.j AS offset, round(sum(cg.v), 4) AS val
              |FROM cg JOIN lim ON lim.j = cg.j
              |WHERE cg.i >= lim.l AND cg.i < $N - lim.l
              |GROUP BY cg.j""".stripMargin)),

    // the custom TypedImperativeAggregate in the oracle gate: tensor-form
    // center of mass over the grid image vs the relational weighted mean
    Q("q_com_tensor",
      (s, dir) => toTensor(valueGrid(s, dir), asBool = false)
        .select(lit(0L).as("id"), col("data"))
        .agg(graft.exprs.CenterOfMassAgg.centerOfMass(
          col("data"), lit(N), lit(N), col("id")).as("com"))
        .select(round(element_at(col("com"), 2), 4).as("com_i"),
                round(element_at(col("com"), 3), 4).as("com_j")),
      Some(s"""WITH $valueGridCte
              |SELECT round(sum(v * i) / sum(v), 4) AS com_i,
              |round(sum(v * j) / sum(v), 4) AS com_j FROM grid""".stripMargin)),

    // batched radon: one 16x16 image per event_type (5 tensor rows), the
    // kernel mapping over the row axis — the reference's batch-of-slices
    // framing (radon.py:213-216) exercised through the oracle gate
    Q("q_radon_batch",
      (s, dir) => {
        val cells = T(s, dir, "events")
          .groupBy(col("event_type"), (col("user_id") % N).as("i"), (col("event_id") % N).as("j"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        val ij = s.range(N).select(col("id").as("i"))
          .crossJoin(s.range(N).select(col("id").as("j")))
        val et = T(s, dir, "events").select("event_type").distinct()
        val grid = et.crossJoin(ij).join(cells, Seq("event_type", "i", "j"), "left")
          .na.fill(0.0, Seq("v"))
          .select(col("event_type"), col("i"), col("j"),
            when((col("i") - 8) * (col("i") - 8) + (col("j") - 8) * (col("j") - 8) > 64, 0.0)
              .otherwise(col("v")).as("v"))
        grid.groupBy("event_type")
          .agg(transform(array_sort(collect_list(struct(col("i"), col("j"), col("v")))),
            x => x.getField("v").cast("double")).as("data"))
          .select(col("event_type"), radonUdf(col("data"), lit(N), array(lit(0.0))).as("sino"))
          .select(col("event_type"), posexplode(col("sino")).as(Seq("offset", "val")))
          .select(col("event_type"), col("offset").cast("long").as("offset"),
            round(col("val"), 4).as("val"))
      },
      Some(s"""WITH cells AS (SELECT event_type, user_id % $N AS i, event_id % $N AS j,
              |  cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS v
              |  FROM events GROUP BY event_type, user_id % $N, event_id % $N),
              |et AS (SELECT DISTINCT event_type FROM events),
              |grid AS (SELECT et.event_type, r1.i AS i, r2.j AS j, coalesce(c.v, 0.0) AS v
              |  FROM et CROSS JOIN range($N) r1(i) CROSS JOIN range($N) r2(j)
              |  LEFT JOIN cells c ON c.event_type = et.event_type AND c.i = r1.i AND c.j = r2.j),
              |cg AS (SELECT event_type, i, j,
              |  CASE WHEN (i-8)*(i-8) + (j-8)*(j-8) > 64 THEN 0.0 ELSE v END AS v FROM grid),
              |lim AS (SELECT r2.j AS j,
              |  count(CASE WHEN (r1.i-8)*(r1.i-8) + (r2.j-8)*(r2.j-8) > 100 THEN 1 END) // 2 AS l
              |  FROM range($N) r1(i) CROSS JOIN range($N) r2(j) GROUP BY r2.j)
              |SELECT cg.event_type, cg.j AS offset, round(sum(cg.v), 4) AS val
              |FROM cg JOIN lim ON lim.j = cg.j
              |WHERE cg.i >= lim.l AND cg.i < $N - lim.l
              |GROUP BY cg.event_type, cg.j""".stripMargin)),

    // the tiled (100 TB path) erosion must agree with the same relational
    // oracle as the single-tensor form — one oracle, two execution paths
    Q("q_tiled_erosion",
      (s, dir) => {
        import s.implicits._
        val ts = 8
        val tiles = maskGrid(s, dir)
          .select((col("i") / ts).cast("int").as("ti"), (col("j") / ts).cast("int").as("tj"),
            (col("i") % ts).as("li"), (col("j") % ts).as("lj"), col("v"))
          .groupBy("ti", "tj")
          .agg(transform(array_sort(collect_list(struct(col("li"), col("lj"), col("v")))),
            x => x.getField("v") === 1).as("data"))
          .select(lit(0L).as("id"), col("ti"), col("tj"), col("data"))
          .as[graft.operators.TiledStencil.Tile]
        val eroded = graft.operators.TiledStencil.erode(tiles, ts, N / ts, N / ts)(s)
        eroded.toDF()
          .select(col("ti"), col("tj"), posexplode(col("data")).as(Seq("pos", "out")))
          .select((col("ti") * ts + col("pos") / ts).cast("long").as("i"),
                  (col("tj") * ts + col("pos") % ts).cast("long").as("j"),
                  when(col("out"), 1).otherwise(0).as("e"))
      },
      Some(s"""WITH $maskGridCte
              |SELECT g.i, g.j, CASE WHEN g.v = 1
              |  AND coalesce(u.v, 1) = 1 AND coalesce(d.v, 1) = 1
              |  AND coalesce(l.v, 1) = 1 AND coalesce(r.v, 1) = 1 THEN 1 ELSE 0 END AS e
              |FROM grid g
              |LEFT JOIN grid u ON u.i = g.i - 1 AND u.j = g.j
              |LEFT JOIN grid d ON d.i = g.i + 1 AND d.j = g.j
              |LEFT JOIN grid l ON l.i = g.i AND l.j = g.j - 1
              |LEFT JOIN grid r ON r.i = g.i AND r.j = g.j + 1""".stripMargin)),

    // no SQL oracle (iterative / geometric / FFT ops) — rows-only checks,
    // verified against the single-node kernels in the ScalaTest suites
    Q("q_hull2d",
      (s, dir) => explodeGrid(
          toTensor(maskGrid(s, dir), asBool = true)
            .select(hullUdf(col("data"), array(lit(N), lit(N))).as("h")),
          "h", N)
        .select(col("i"), col("j"), when(col("out"), 1).otherwise(0).as("h")),
      None),

    Q("q_interp2d",
      (s, dir) => {
        val pts = valueGrid(s, dir).where(col("v") > 0)
        val q = s.range(N).select(col("id").as("qi"))
          .crossJoin(s.range(N).select(col("id").as("qj")))
          .select((col("qi") + 0.25).as("qx"), (col("qj") + 0.75).as("qy"))
        graft.operators.ScatteredInterp(pts, "i", "j", "v", q, "qx", "qy", "val", fill = -1.0)
          .select(col("qx"), col("qy"), round(col("val"), 4).as("val"))
      },
      None),

    Q("q_label2d",
      (s, dir) => {
        val lab = toTensor(maskGrid(s, dir), asBool = false)
          .select(labelUdf(col("data"), array(lit(N), lit(N)), lit(0.0), lit(2)).as("lab"))
        lab.select(posexplode(col("lab").getField("_3")).as(Seq("idx", "sz")))
          .select((col("idx") + 1).as("label"), col("sz").as("size"))
      },
      None),

    Q("q_inverse_radon",
      (s, dir) => {
        val circled = valueGrid(s, dir).select(col("i"), col("j"),
          when((col("i") - 8) * (col("i") - 8) + (col("j") - 8) * (col("j") - 8) > 64, 0.0)
            .otherwise(col("v")).as("v"))
        val theta = ZoomSeqLit.thetaArray(16)
        toTensor(circled, asBool = false)
          .select(inverseRadonUdf(
            radonUdf(col("data"), lit(N), theta), lit(N), theta, lit(0.0)).as("rec"))
          .select(posexplode(col("rec")).as(Seq("pos", "out")))
          .select((col("pos") / N).cast("long").as("i"), (col("pos") % N).cast("long").as("j"),
            round(col("out"), 2).as("v"))
      },
      None)
  )
}

private object ZoomSeqLit {
  import org.apache.spark.sql.Column
  def thetaArray(n: Int): Column =
    array(graft.kernels.RadonKernel.thetaLinspace(n).map(lit): _*)
}

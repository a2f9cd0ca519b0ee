package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernels.LabelKernel
import graft.operators.TiledStencil.Tile

/** Distributed connected-components labeling over tiled boolean masks — the
  * 100 TB path for the reference's `label`
  * (/root/reference/imops/measure.py:33-137), which is single-node cc3d.
  *
  * Classic two-level scheme:
  *  1. label each tile locally (the same union-find kernel), representative
  *     of each local component = the minimum *global* flat pixel index it
  *     contains — a globally unique, order-meaningful id;
  *  2. adjacency across tile borders becomes an edge list between
  *     representatives (shuffle volume O(perimeter), not O(area));
  *  3. iterative min-label propagation over the representative graph to a
  *     fixpoint (driver loop, each round one join — the standard Spark CC
  *     pattern; rounds = diameter of the component graph);
  *  4. final labels densified by rank of the component's minimum pixel
  *     index, which equals the reference's row-major first-appearance
  *     numbering — so results match the single-node kernel exactly.
  *
  * Boolean masks; connectivity 1..ndim in both the 2-D and 3-D forms
  * (conn-1 merges via face keys, conn ≥ 2 via the shell-probe equi-join).
  */
object DistributedLabel {

  final case class Px(g: Long, rep: Long)
  final case class Border(bkey: Long, pos: Int, side: Int, rep: Long)

  /** Steps 3+4, shared by the 2-D and 3-D forms: min-label propagation to a
    * fixpoint over the representative graph, then scan-order densification.
    *
    * 100x-scale hardening (round-1 verdict): the loop runs on pair RDDs
    * hash-partitioned ONCE — every edges-join is then shuffle-free, each
    * iteration's result is localCheckpoint'ed so lineage stays O(1) instead
    * of growing per round, and superseded iterations are unpersisted
    * eagerly. Densify ranks component roots with sortBy + zipWithIndex —
    * a distributed range-partitioned sort — instead of a row_number over a
    * global single-partition Window. */
  private def propagateAndDensify(localized: DataFrame, symEdges: DataFrame)
                                 (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // the min-label fixpoint (hash-partitioned once, pointer-doubled,
    // localCheckpoint'ed rounds) lives in GraphCC, shared with the corpus
    // dedup-cluster pipeline
    val labels = GraphCC.minLabels(
      localized.select(col("rep")).distinct().as[Long].rdd,
      symEdges.as[(Long, Long)].rdd)
    val roots = labels.values.distinct(spark.sparkContext.defaultParallelism)
      .sortBy(identity).zipWithIndex()
      .map { case (lbl, idx) => (lbl, idx + 1) }
    localized.join(labels.toDF("rep", "lbl"), Seq("rep"))
      .join(roots.toDF("lbl", "label"), Seq("lbl"))
      .select(col("g"), col("label").cast("long").as("label"))
  }

  /** Returns (global flat pixel index, label) for every true pixel.
    * `connectivity` 1 (cross) or 2 (8-adjacency, the skimage conn-2):
    * conn-1 merges across tiles by face-key matching; conn-2 switches to
    * the same shell-probe equi-join as the 3-D form (corner cells of four
    * tiles can meet diagonally), shuffle O(perimeter × neighborhood). */
  def apply(tiles: Dataset[Tile], ts: Int, gridRows: Int, gridCols: Int,
            connectivity: Int = 1)
           (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val cols = gridCols * ts

    // 1. local labeling; emit (g, rep) per true pixel + border cells
    val localized = tiles.flatMap { t =>
      val data = t.data.map(b => if (b) 1.0 else 0.0)
      val res = LabelKernel.label(data, Array(ts, ts), connectivity = connectivity)
      // rep per local label = min global index
      val rep = scala.collection.mutable.Map.empty[Long, Long]
      var i = 0
      while (i < ts * ts) {
        val lb = res.labels(i)
        if (lb != 0) {
          val g = (t.ti.toLong * ts + i / ts) * cols + (t.tj.toLong * ts + i % ts)
          if (!rep.contains(lb) || g < rep(lb)) rep(lb) = rep.get(lb).map(math.min(_, g)).getOrElse(g)
        }
        i += 1
      }
      (0 until ts * ts).flatMap { i =>
        val lb = res.labels(i)
        if (lb == 0) None
        else {
          val g = (t.ti.toLong * ts + i / ts) * cols + (t.tj.toLong * ts + i % ts)
          Some(Px(g, rep(lb)))
        }
      }
    }.toDF("g", "rep").cache()

    // 2. border edges: vertical boundaries between (ti,tj) and (ti,tj+1)
    // keyed by (boundary id, row); horizontal analogously. Two sides with
    // the same key and both true -> edge between reps.
    val edges =
      if (connectivity == 1) {
        val borders = tiles.flatMap { t =>
          val data = t.data.map(b => if (b) 1.0 else 0.0)
          val res = LabelKernel.label(data, Array(ts, ts), connectivity = 1)
          val rep = scala.collection.mutable.Map.empty[Long, Long]
          for (i <- 0 until ts * ts; if res.labels(i) != 0) {
            val g = (t.ti.toLong * ts + i / ts) * cols + (t.tj.toLong * ts + i % ts)
            val lb = res.labels(i)
            rep(lb) = rep.get(lb).map(math.min(_, g)).getOrElse(g)
          }
          def repAt(i: Int, j: Int): Option[Long] = {
            val lb = res.labels(i * ts + j)
            if (lb == 0) None else Some(rep(lb))
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[Border]
          // vertical boundary to the right: boundary id = (ti, tj) pair hashed
          for (i <- 0 until ts) {
            repAt(i, ts - 1).foreach { r =>
              out += Border(((t.ti.toLong * gridCols + t.tj) << 1) | 0, i, 0, r) }
            if (t.tj > 0) repAt(i, 0).foreach { r =>
              out += Border(((t.ti.toLong * gridCols + (t.tj - 1)) << 1) | 0, i, 1, r) }
          }
          // horizontal boundary below
          for (j <- 0 until ts) {
            repAt(ts - 1, j).foreach { r =>
              out += Border(((t.ti.toLong * gridCols + t.tj) << 1) | 1, j, 0, r) }
            if (t.ti > 0) repAt(0, j).foreach { r =>
              out += Border((((t.ti - 1).toLong * gridCols + t.tj) << 1) | 1, j, 1, r) }
          }
          out
        }.toDF("bkey", "pos", "side", "rep")
        borders.where(col("side") === 0).as("a")
          .join(borders.where(col("side") === 1).as("b"), Seq("bkey", "pos"))
          .select(col("a.rep").as("src"), col("b.rep").as("dst"))
          .where(col("src") =!= col("dst"))
      } else {
        // conn-2 (8-adjacency): shell-probe equi-join like the 3-D form —
        // a tile-corner cell can meet a diagonal tile's corner, which the
        // face-key scheme cannot express
        val (nR, nC) = (gridRows.toLong * ts, gridCols.toLong * ts)
        val shell = tiles.flatMap { t =>
          val data = t.data.map(b => if (b) 1.0 else 0.0)
          val res = LabelKernel.label(data, Array(ts, ts), connectivity = connectivity)
          val rep = scala.collection.mutable.Map.empty[Long, Long]
          for (f <- 0 until ts * ts; if res.labels(f) != 0) {
            val g = (t.ti.toLong * ts + f / ts) * cols + (t.tj.toLong * ts + f % ts)
            rep(res.labels(f)) = rep.get(res.labels(f)).map(math.min(_, g)).getOrElse(g)
          }
          for {
            i <- 0 until ts; j <- 0 until ts
            if i == 0 || i == ts - 1 || j == 0 || j == ts - 1
            lb = res.labels(i * ts + j) if lb != 0
          } yield (t.ti.toLong * ts + i, t.tj.toLong * ts + j, rep(lb))
        }.toDF("gi", "gj", "rep").cache()
        val offsets = Seq(-1, 0, 1).flatMap(di => Seq(-1, 0, 1).map(dj => (di, dj)))
          .filter { case (di, dj) => di != 0 || dj != 0 }
        val probes = shell.crossJoin(broadcast(offsets.toDF("di", "dj")))
          .select(col("gi"), col("gj"), col("rep"),
            (col("gi") + col("di")).as("ni"), (col("gj") + col("dj")).as("nj"))
          .where(col("ni") >= 0 && col("ni") < nR && col("nj") >= 0 && col("nj") < nC)
          .where((col("ni") / ts).cast("long") =!= (col("gi") / ts).cast("long") ||
            (col("nj") / ts).cast("long") =!= (col("gj") / ts).cast("long"))
          .select(col("ni"), col("nj"), col("rep"))
        probes.join(
            shell.select(col("gi").as("ni"), col("gj").as("nj"), col("rep").as("rep2")),
            Seq("ni", "nj"))
          .select(col("rep").as("src"), col("rep2").as("dst"))
          .where(col("src") =!= col("dst"))
      }
    val symEdges = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

    // 3+4. fixpoint propagation and scan-order densification
    propagateAndDensify(localized, symEdges)
  }

  import graft.operators.TiledStencil.Tile3
  final case class Px3(g: Long, rep: Long)
  final case class Border3(bkey: Long, pos: Int, side: Int, rep: Long)

  /** 3-D volumes: same two-level scheme with face (plane) boundaries.
    *
    * `connectivity` follows the reference's skimage convention mapped to
    * cc3d 6/18/26 (/root/reference/imops/measure.py:22-29): 1 = faces only,
    * 2 = +edges, 3 = +corners. At connectivity 1 cross-tile merging is the
    * face-key matching below (zero coordinate math on the shuffle key); at
    * 2-3 a border cell can also connect through tile EDGES and CORNERS, so
    * the exchange switches to a shell-probe equi-join: every true cell on a
    * tile's 1-deep shell emits its out-of-tile neighbor coordinates, which
    * join against the shells of the owning tiles. Shuffle volume stays
    * O(surface × neighborhood), never O(volume). */
  def apply3(tiles: Dataset[Tile3], ts: Int, grid: Array[Int], connectivity: Int = 1)
            (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (d1, d2) = (grid(1) * ts, grid(2) * ts)

    def localReps(t: Tile3): (graft.kernels.LabelKernel.Result, collection.Map[Long, Long]) = {
      val res = graft.kernels.LabelKernel.label(
        t.data.map(b => if (b) 1.0 else 0.0), Array(ts, ts, ts), connectivity = connectivity)
      val rep = scala.collection.mutable.Map.empty[Long, Long]
      var f = 0
      while (f < ts * ts * ts) {
        val lb = res.labels(f)
        if (lb != 0) {
          val (i, j, k) = (f / (ts * ts), (f / ts) % ts, f % ts)
          val g = ((t.ti.toLong * ts + i) * d1 + (t.tj.toLong * ts + j)) * d2 + (t.tk.toLong * ts + k)
          rep(lb) = rep.get(lb).map(math.min(_, g)).getOrElse(g)
        }
        f += 1
      }
      (res, rep)
    }

    val localized = tiles.flatMap { t =>
      val (res, rep) = localReps(t)
      (0 until ts * ts * ts).flatMap { f =>
        val lb = res.labels(f)
        if (lb == 0) None
        else {
          val (i, j, k) = (f / (ts * ts), (f / ts) % ts, f % ts)
          val g = ((t.ti.toLong * ts + i) * d1 + (t.tj.toLong * ts + j)) * d2 + (t.tk.toLong * ts + k)
          Some(Px3(g, rep(lb)))
        }
      }
    }.toDF("g", "rep").cache()

    val edges =
      if (connectivity == 1) {
        val borders = tiles.flatMap { t =>
          val (res, rep) = localReps(t)
          def repAt(i: Int, j: Int, k: Int): Option[Long] = {
            val lb = res.labels((i * ts + j) * ts + k)
            if (lb == 0) None else Some(rep(lb))
          }
          def faceKey(ti: Int, tj: Int, tk: Int, axis: Int): Long =
            (((ti.toLong * grid(1) + tj) * grid(2) + tk) * 3) + axis
          val out = scala.collection.mutable.ArrayBuffer.empty[Border3]
          for (a <- 0 until ts; b <- 0 until ts) {
            val pos = a * ts + b
            // +i face of this tile vs -i face of tile below (axis 0)
            repAt(ts - 1, a, b).foreach(r => out += Border3(faceKey(t.ti, t.tj, t.tk, 0), pos, 0, r))
            if (t.ti > 0) repAt(0, a, b).foreach(r => out += Border3(faceKey(t.ti - 1, t.tj, t.tk, 0), pos, 1, r))
            // +j face (axis 1)
            repAt(a, ts - 1, b).foreach(r => out += Border3(faceKey(t.ti, t.tj, t.tk, 1), pos, 0, r))
            if (t.tj > 0) repAt(a, 0, b).foreach(r => out += Border3(faceKey(t.ti, t.tj - 1, t.tk, 1), pos, 1, r))
            // +k face (axis 2)
            repAt(a, b, ts - 1).foreach(r => out += Border3(faceKey(t.ti, t.tj, t.tk, 2), pos, 0, r))
            if (t.tk > 0) repAt(a, b, 0).foreach(r => out += Border3(faceKey(t.ti, t.tj, t.tk - 1, 2), pos, 1, r))
          }
          out
        }.toDF("bkey", "pos", "side", "rep")
        borders.where(col("side") === 0).as("a")
          .join(borders.where(col("side") === 1).as("b"), Seq("bkey", "pos"))
          .select(col("a.rep").as("src"), col("b.rep").as("dst"))
          .where(col("src") =!= col("dst"))
      } else {
        // shell-probe exchange for edge/corner adjacency: true cells on the
        // 1-deep shell of each tile, keyed by global coordinates. A probe is
        // a shell cell's out-of-tile neighbor coordinate; the equi-join
        // probe→shell materializes exactly the cross-tile adjacency. Cells
        // adjacent WITHIN a tile share a local label already (the kernel ran
        // at the same connectivity), so same-tile probes are filtered.
        val (nD0, nD1, nD2) = (grid(0).toLong * ts, grid(1).toLong * ts, grid(2).toLong * ts)
        val shell = tiles.flatMap { t =>
          val (res, rep) = localReps(t)
          for {
            i <- 0 until ts; j <- 0 until ts; k <- 0 until ts
            if i == 0 || i == ts - 1 || j == 0 || j == ts - 1 || k == 0 || k == ts - 1
            lb = res.labels((i * ts + j) * ts + k) if lb != 0
          } yield (t.ti.toLong * ts + i, t.tj.toLong * ts + j, t.tk.toLong * ts + k, rep(lb))
        }.toDF("gi", "gj", "gk", "rep").cache()
        val offsets = for {
          di <- -1 to 1; dj <- -1 to 1; dk <- -1 to 1
          m = math.abs(di) + math.abs(dj) + math.abs(dk) if m >= 1 && m <= connectivity
        } yield (di, dj, dk)
        val probes = shell.crossJoin(broadcast(offsets.toDF("di", "dj", "dk")))
          .select(col("gi"), col("gj"), col("gk"), col("rep"),
            (col("gi") + col("di")).as("ni"), (col("gj") + col("dj")).as("nj"),
            (col("gk") + col("dk")).as("nk"))
          .where(col("ni") >= 0 && col("ni") < nD0 && col("nj") >= 0 && col("nj") < nD1 &&
            col("nk") >= 0 && col("nk") < nD2)
          .where((col("ni") / ts).cast("long") =!= (col("gi") / ts).cast("long") ||
            (col("nj") / ts).cast("long") =!= (col("gj") / ts).cast("long") ||
            (col("nk") / ts).cast("long") =!= (col("gk") / ts).cast("long"))
          .select(col("ni"), col("nj"), col("nk"), col("rep"))
        probes.join(
            shell.select(col("gi").as("ni"), col("gj").as("nj"), col("gk").as("nk"),
              col("rep").as("rep2")),
            Seq("ni", "nj", "nk"))
          .select(col("rep").as("src"), col("rep2").as("dst"))
          .where(col("src") =!= col("dst"))
      }
    val symEdges = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()

    propagateAndDensify(localized, symEdges)
  }
}

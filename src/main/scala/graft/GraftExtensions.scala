package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.exprs.{CenterOfMassAgg, ComPartialSums, DotProduct, Interp1dExpr,
  InverseRadonExpr, MorphExpr, RadonExpr, ZoomExpr}

/** Session-extension registration: exposes the custom Catalyst expressions
  * as SQL functions so `spark.sql` users get them too. Install with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *
  * or on a live session via `GraftExtensions.register(spark)`. This is the
  * engine's extension surface (SURVEY §2.8 "UDF/UDAF/UDTF"): new execution
  * providers plug in as Expressions/Aggregates, mirroring how the reference
  * plugs in backends rather than functions (backend.py:7-26).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer surface: key-less |l.t - r.t| <= w joins re-plan from
    // nested-loop to the bucketed hash join (see BandJoinRewrite),
    // key-less levenshtein(l.s, r.s) <= d joins re-plan to the PassJoin
    // blocked equi-join with a canonical-witness exactly-once predicate
    // (see FuzzyJoinRewrite), and key-less bit_count(l.h ^ r.h) <= r
    // joins re-plan to the pigeonhole (r+1)-band equi-join with a
    // first-equal-band witness (see HammingJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.FuzzyJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.HammingJoinRewrite)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_product",
      info("dot_product", "dot_product(a, b) - codegen'd Σ a[k]*b[k] over numeric arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("center_of_mass_agg",
      info("center_of_mass_agg",
        "center_of_mass_agg(data, rows, cols, slice) - weighted mean coordinate over slice rows"),
      (args: Seq[Expression]) =>
        CenterOfMassAgg(args(0), args(1), args(2), args(3)).toAggregateExpression()),
    ("com_partial",
      info("com_partial",
        "com_partial(data, rows, cols, slice) - per-slice [Σw, Σw·s, Σw·i, Σw·j] partial sums"),
      (args: Seq[Expression]) => ComPartialSums(args(0), args(1), args(2), args(3))),
    ("graft_zoom",
      info("graft_zoom",
        "graft_zoom(data, shape, scale, order, cval) - n-d zoom, returns struct(_1 data, _2 shape)"),
      (args: Seq[Expression]) => ZoomExpr(args(0), args(1), args(2), args(3), args(4))),
    ("graft_interp1d",
      info("graft_interp1d",
        "graft_interp1d(xs, ys, xq, extrapolate, fill) - whole-array linear interpolation"),
      (args: Seq[Expression]) => Interp1dExpr(args(0), args(1), args(2), args(3), args(4))),
    ("graft_morph",
      info("graft_morph",
        "graft_morph(mask, shape, dilation) - default-cross binary erosion/dilation"),
      (args: Seq[Expression]) => MorphExpr(args(0), args(1), args(2))),
    ("graft_radon",
      info("graft_radon", "graft_radon(data, size, theta_deg) - forward radon of one slice"),
      (args: Seq[Expression]) => RadonExpr(args(0), args(1), args(2))),
    ("graft_iradon",
      info("graft_iradon",
        "graft_iradon(sinogram, size, theta_deg, fill) - filtered backprojection of one slice"),
      (args: Seq[Expression]) => InverseRadonExpr(args(0), args(1), args(2), args(3))))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

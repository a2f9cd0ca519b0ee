package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.exprs.{CenterOfMassAgg, DotProduct}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
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
        CenterOfMassAgg(args(0), args(1), args(2), args(3)).toAggregateExpression()))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}

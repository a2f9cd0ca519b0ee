package graft.core

import org.apache.spark.sql.SparkSession

/** Execution-backend dispatch, the Spark mapping of the reference's Backend
  * registry (/root/reference/imops/backend.py:7-95):
  *
  *  - `Builtin` — compositions of codegen'd Catalyst expressions (the
  *    analog of the reference's default `Cython` fast path)
  *  - `Kernel`  — single-pass JVM kernels behind UDFs (the analog of the
  *    always-correct `Scipy` reference path; for md5/array-heavy ops it is
  *    also the faster one because higher-order functions are interpreted)
  *
  * Selection: explicit argument > session conf `spark.graft.backend` >
  * default. Unknown names are rejected like `resolve_backend`
  * (backend.py:29-48). `withBackend` scopes a setting like the
  * `imops_backend` context manager (backend.py:51-64).
  */
object Backend {
  sealed trait Kind { def name: String }
  case object Builtin extends Kind { val name = "builtin" }
  case object Kernel extends Kind { val name = "kernel" }

  val ConfKey = "spark.graft.backend"
  val ParallelismKey = "spark.graft.parallelism"

  private val registry = Map(Builtin.name -> Builtin, Kernel.name -> Kernel)

  def resolve(explicit: Option[String], spark: SparkSession, default: Kind = Builtin): Kind = {
    val name = explicit.orElse(spark.conf.getOption(ConfKey)).getOrElse(default.name)
    registry.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(
        s"Unknown backend '$name'; available: ${registry.keys.mkString(", ")}"))
  }

  /** Scoped backend override, like the `imops_backend` context manager. */
  def withBackend[A](spark: SparkSession, kind: Kind)(body: => A): A = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, kind.name)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  /** The `normalize_num_threads` analog (/root/reference/imops/utils.py:40-92):
    * clamp a requested parallelism to the session's capability; negative n
    * means "all cores + n + 1" like the reference's negative num_threads. */
  def normalizeParallelism(requested: Int, spark: SparkSession): Int =
    clampParallelism(requested, spark.sparkContext.defaultParallelism)

  /** The pure clamp rule behind [[normalizeParallelism]], exposed so the
    * mapping itself is driver-gateable over a fixed (requested, avail)
    * grid (`q_num_threads`) — the live-session form depends on the host's
    * core count and cannot be replayed by an engine-independent oracle. */
  def clampParallelism(requested: Int, avail: Int): Int = {
    val n = if (requested < 0) avail + requested + 1 else requested
    math.max(1, math.min(n, avail))
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd+ args: run only the named queries (local iteration)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Compatibility shim for NANOS-era testdata only: surfaces
      // TIMESTAMP(NANOS) parquet as ns-longs. The current testdata writes
      // TIMESTAMP(MICROS); T.normTs handles that era, so nothing relies on
      // this conf — it just keeps both encodings readable.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that throws must STILL surface in the driver's artifact — a
    // gate you can silently fall out of is not a gate. On failure we write a
    // one-row sentinel frame (schema/hash can never match an oracle, so the
    // query shows up as a loud FAIL row instead of vanishing from the
    // correctness file) plus an err sidecar with the real message.
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    var sinceClear = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        // heap hygiene on long sweeps: many gates persist shared inputs /
        // operator state and a 200-query session accumulates cached blocks
        // until a mid-alphabet query OOMs (first seen: q_kcore at sf0.1).
        // Periodic clearCache bounds the peak; SharedInputs re-persists
        // evicted frames on next access, so later shared gates stay fast.
        sinceClear += 1
        if (sinceClear >= 50) { spark.catalog.clearCache(); sinceClear = 0 }
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // a rerun into the same outDir must not leave a stale marker
          Files.deleteIfExists(Paths.get(s"$outDir/$name.err.txt"))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failed += name
          try {
            import spark.implicits._
            Seq(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
              .toDF("__verify_error")
              .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
            Files.writeString(Paths.get(s"$outDir/$name.err.txt"),
              s"$name\n${e}\n")
          } catch { case _: Throwable => () }
        }
      }
    }
    if (failed.nonEmpty)
      Files.writeString(Paths.get(s"$outDir/verify_errors.json"),
        failed.sorted.map(n => "\"" + n + "\"").mkString("[", ",", "]"))
    else Files.deleteIfExists(Paths.get(s"$outDir/verify_errors.json"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // subset runs dump only the selected oracles too — otherwise
    // check_oracle.py over a partial output dir reports every skipped
    // query as "spark output missing"
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

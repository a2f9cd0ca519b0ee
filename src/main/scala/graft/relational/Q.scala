package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared verification query: a Spark DataFrame program plus (usually)
  * an equivalent ANSI/DuckDB SQL oracle over the same parquet tables.
  * Column names are aligned on both sides (the driver sorts columns by name
  * before hashing). Doubles that accumulate FP noise are rounded identically
  * on both sides; integer-valued doubles and strings are left exact.
  */
final case class Q(name: String,
                   run: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

object T {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}

/** Memoized, persisted shared derived inputs. The declared-query suite
  * reuses the same derived tables (per-order quantity arrays, the 16x16
  * event grids) across dozens of queries; building each once per session
  * mirrors how a real pipeline materializes its feature table instead of
  * re-shuffling the source per query (the round-1 review measured the
  * repeated collect_list groupBy at ~3x the sibling query cost). Keyed by
  * (session, dir, name) so Verify/Bench/test sessions stay independent;
  * persist() is lazy, so the first query that runs materializes the frame.
  */
object SharedInputs {
  private val memo =
    scala.collection.mutable.Map[(SparkSession, String, String), DataFrame]()
  def apply(s: SparkSession, dir: String, key: String)(build: => DataFrame): DataFrame =
    memo.synchronized {
      // evict entries of stopped sessions so test suites that create/stop
      // many sessions don't retain dead cached plans for the JVM lifetime
      memo.filterInPlace { case ((sess, _, _), _) => !sess.sparkContext.isStopped }
      memo.getOrElseUpdate((s, dir, key), build.persist())
    }
}

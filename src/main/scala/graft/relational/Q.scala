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

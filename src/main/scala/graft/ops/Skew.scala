package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §4 / 100 TB design notes).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting is the deliberate tool for the pathological ones (a handful
  * of hot keys carrying a large fraction of a 100 TB fact table —
  * exactly what a hub node in a merged knowledge graph looks like).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `salts` buckets: big rows get a deterministic salt
    * from a sibling column's hash (never rand() — results must be
    * reproducible), the small side is exploded `salts`× so every
    * (key, salt) pair finds its match. Correct for inner joins on any
    * key distribution; the salted shuffle spreads one hot key across
    * `salts` reducers instead of one.
    *
    * The small side grows by the salt factor — acceptable exactly when
    * it is broadcast-sized or near it, which is the situation where a
    * hot-keyed big side otherwise stalls a single reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: String, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts)).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }
}

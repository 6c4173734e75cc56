package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned readers for the driver-generated parquet tables
  * (/root/testdata/sf*). See FIXTURES.md for schemas.
  *
  * At 100 TB these reads become partitioned parquet scans over object
  * storage; everything downstream only relies on columnar pruning +
  * predicate pushdown, which Catalyst applies identically there.
  */
object Tables {
  private def p(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def region(s: SparkSession, d: String): DataFrame    = s.read.parquet(p(d, "region"))
  def nation(s: SparkSession, d: String): DataFrame    = s.read.parquet(p(d, "nation"))
  def customer(s: SparkSession, d: String): DataFrame  = s.read.parquet(p(d, "customer"))
  def supplier(s: SparkSession, d: String): DataFrame  = s.read.parquet(p(d, "supplier"))
  def part(s: SparkSession, d: String): DataFrame      = s.read.parquet(p(d, "part"))
  def orders(s: SparkSession, d: String): DataFrame    = s.read.parquet(p(d, "orders"))
  def lineitem(s: SparkSession, d: String): DataFrame  = s.read.parquet(p(d, "lineitem"))
  def events(s: SparkSession, d: String): DataFrame    = s.read.parquet(p(d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(p(d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(p(d, "embeddings"))
}

package graft

import org.apache.spark.sql.SparkSession

/** User-facing entry point: make an existing SparkSession graft-aware.
  *
  * `init` registers the native functions (cosine_sim, count_min_est)
  * and the custom planner strategy (native as-of join);
  * `registerTables` exposes a scale-factor directory as SQL temp views
  * so every operator is reachable from plain `spark.sql(...)` as well
  * as the typed/DataFrame APIs. For a fresh session, the equivalent is
  * `SparkSession.builder.withExtensions(new graft.plans.GraftExtensions)`.
  */
object Graft {
  def init(spark: SparkSession): Unit = {
    // events.parquet stores TIMESTAMP(NANOS); Spark 4 only reads it with
    // this flag (Tables.events then floors ns→µs). Session-level conf is
    // set HERE, once, not inside table readers.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // every oracle-verified value was produced under UTC, and the
    // round-8+ events data is TIMESTAMP_NTZ whose cast to TimestampType
    // reads the session zone (Tables.events enforces this) — pin it at
    // the same once-per-session spot as the parquet flag
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    graft.plans.GraftExtensions.registerFunctions(spark)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofStrategy
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.CollapseRedundantCase))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.CollapseRedundantCase
  }

  private val tableNames = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      // always go through the Tables readers: SQL users then share the
      // same plan-canonical cache (and the events ns→µs fix) as the
      // DataFrame API instead of re-decoding parquet per query
      val df = t match {
        case "region"     => Tables.region(spark, sfDir)
        case "nation"     => Tables.nation(spark, sfDir)
        case "customer"   => Tables.customer(spark, sfDir)
        case "supplier"   => Tables.supplier(spark, sfDir)
        case "part"       => Tables.part(spark, sfDir)
        case "orders"     => Tables.orders(spark, sfDir)
        case "lineitem"   => Tables.lineitem(spark, sfDir)
        case "events"     => Tables.events(spark, sfDir)
        case "documents"  => Tables.documents(spark, sfDir)
        case "embeddings" => Tables.embeddings(spark, sfDir)
      }
      df.createOrReplaceTempView(t)
    }
}

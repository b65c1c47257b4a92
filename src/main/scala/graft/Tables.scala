package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Loader for the driver's synthetic parquet tables (TESTDATA.md).
 *
 * Reads are plain `spark.read.parquet` so Catalyst's parquet source handles
 * predicate pushdown, column pruning and (on a partitioned layout) partition
 * pruning. At 100 TB the same call reads a partitioned/bucketed table — the
 * query builders below do not care.
 *
 * Under-parallel scans: parquet splits at ROW-GROUP granularity, and the
 * testdata tables are single-row-group files, so a bare scan yields ONE
 * input partition — every map-side stage (JSON parsing, shingling, minhash
 * signatures) would run on 1 of 32 cores until the first shuffle. [[spread]]
 * guards against that: iff the scan's split count is below the session's
 * default parallelism it inserts a round-robin repartition (Catalyst still
 * pushes filters/pruning through Repartition to the scan, so the exchange
 * carries only surviving rows). On a real cluster a 100 TB table has
 * thousands of splits and the guard never fires — this is purely the
 * "small file, big machine" escape hatch.
 */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Repartition `df` to the session parallelism iff its scan is
    * under-parallel (fewer splits than cores — the single-row-group case). */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spread(spark, spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /**
   * events.parquet has shipped `ts` under two physical types across testdata
   * generations: TIMESTAMP(NANOS) — which Spark's parquet reader rejects
   * ([PARQUET_TYPE_ILLEGAL]) unless nanos are read as raw longs — and plain
   * TIMESTAMP(MICROS) without timezone, which Spark reads as TIMESTAMP_NTZ.
   * Normalize both to a micros TimestampType column (the session runs in
   * UTC, so the NTZ→TZ cast is a reinterpretation, value-identical to
   * DuckDB's naive TIMESTAMP read of the same file).
   */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // legacy nanos-as-long: `div` is INTEGRAL division — Column `/`
        // would go through Double, and ns-epoch values (~1.7e18) exceed
        // 2^53, so the rounding could move a truncated micro by ±1 vs
        // DuckDB's exact ns→us integer cast
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

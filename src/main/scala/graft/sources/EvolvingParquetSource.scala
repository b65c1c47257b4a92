package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Schema-evolution-tolerant parquet reading: a long-lived 100 TB table is
 * never one schema — columns get added over months of ingest, and old
 * files simply lack them. Spark's default read takes the schema of a
 * random file and silently DROPS the new columns when that file is old;
 * `mergeSchema` fixes discovery but leaves policy (defaults, type widen,
 * required columns) to the caller. This source makes the policy explicit:
 *
 *  - discovery: union of all file schemas (`mergeSchema=true` — a
 *    footer-only pass, no data read);
 *  - presence: every `expect`ed column exists afterwards (absent in ALL
 *    files → fail fast, not NULL-flood downstream);
 *  - defaults: caller-supplied per-column default fills the NULLs that
 *    old files produce for new columns (`coalesce`, codegen'd, map-only).
 *
 * This mirrors what table formats (Delta/Iceberg) do in their metadata
 * layer, expressed over raw parquet directories.
 */
object EvolvingParquetSource {

  /** Read `path` with union-of-schemas discovery; fail if any of
    * `required` is missing everywhere; fill `defaults` into NULL cells of
    * evolved columns. */
  def read(spark: SparkSession, path: String,
           required: Seq[String] = Nil,
           defaults: Map[String, Column] = Map.empty): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val have = df.columns.toSet
    val missing = required.filterNot(have)
    require(missing.isEmpty,
      s"required columns absent from every file under $path: " +
        missing.mkString(", "))
    defaults.foldLeft(df) { case (d, (name, dflt)) =>
      if (have(name)) d.withColumn(name, coalesce(col(name), dflt))
      else d.withColumn(name, dflt)
    }
  }

  /** The merged (union) schema without reading data — footers only. */
  def discoverSchema(spark: SparkSession, path: String): StructType =
    spark.read.option("mergeSchema", "true").parquet(path).schema
}

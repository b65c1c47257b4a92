package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

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
 *  - defaults: two tiers with different null semantics, below.
 *
 * This mirrors what table formats (Delta/Iceberg) do in their metadata
 * layer, expressed over raw parquet directories.
 */
object EvolvingParquetSource {

  /** Read `path` with union-of-schemas discovery; fail if any of
    * `required` is missing everywhere; fill `defaults` into NULL cells of
    * evolved columns.
    *
    * Null semantics — COARSER than Delta/Iceberg, by design: the fill is
    * a single codegen'd `coalesce` over the whole column, so it replaces
    * EVERY null — both the nulls synthesized for files that lack the
    * column AND genuine null values written by files that have it. The
    * two are indistinguishable afterwards. When the column is
    * non-nullable-with-default by contract (the common evolved-metric
    * case) this is exactly right and costs one map-only expression; when
    * genuine nulls must survive, use [[readExact]], which scopes the
    * default to the files that actually lack the column. */
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

  /** Exact Delta/Iceberg missing-column semantics: the default is applied
    * ONLY to rows coming from files whose footer lacks the column;
    * genuine nulls in files that do contain it pass through untouched.
    *
    * Implementation: one footer pass groups the data files by which of
    * the `defaults` columns they contain (footers only — no data read;
    * table formats keep this exact information in their metadata layer,
    * which is the scale path for very large file counts), then each
    * group is read as its own generation, given literals for its missing
    * columns, and the generations are unioned by name. Per-group reads
    * keep the fill map-only and codegen'd — no join against file paths. */
  def readExact(spark: SparkSession, path: String,
                required: Seq[String] = Nil,
                defaults: Map[String, Column] = Map.empty): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files = listDataFiles(fs, root)
    require(files.nonEmpty, s"no parquet data files under $path")

    val groups: Map[Set[String], Seq[Path]] = files.groupBy { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val mt = reader.getFileMetaData.getSchema
        defaults.keySet.filter(mt.containsField)
      } finally reader.close()
    }

    val generations = groups.toSeq.map { case (present, paths) =>
      val gen = spark.read.option("mergeSchema", "true")
        .parquet(paths.map(_.toString): _*)
      (defaults -- present).foldLeft(gen) { case (d, (name, dflt)) =>
        d.withColumn(name, dflt)
      }
    }
    val df = generations.reduce(
      (a, b) => a.unionByName(b, allowMissingColumns = true))

    val have = df.columns.toSet
    val missing = required.filterNot(have)
    require(missing.isEmpty,
      s"required columns absent from every file under $path: " +
        missing.mkString(", "))
    df
  }

  private def listDataFiles(fs: FileSystem, root: Path): Seq[Path] = {
    val out = ArrayBuffer.empty[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
        !name.startsWith("."))
        out += st.getPath
    }
    out.toSeq
  }

  /** The merged (union) schema without reading data — footers only. */
  def discoverSchema(spark: SparkSession, path: String): StructType =
    spark.read.option("mergeSchema", "true").parquet(path).schema
}

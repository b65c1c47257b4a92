// Probe: where do q27's 17 s go at sf1docs — collision volume or bucket skew?
import org.apache.spark.sql.functions._
import graft.ops._
import graft.Tables

{
  val dir = "/tmp/sf1docs"
  spark.sparkContext.setLogLevel("WARN")
  spark.conf.set("spark.sql.shuffle.partitions", 32)

  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name%-44s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
  }

  val docs = Tables.documents(spark, dir)
  val n = docs.count()
  println(s"[probe] docs = $n")

  // replicate the q27 fingerprint + banding stages
  val base = Dedup.hashedShingleSets(docs, "doc_id", "text", 2)
  val fp = base.select(col("id"),
    Dedup.simhashFromHashes(transform(col("ih"), h => xxhash64(h))).as("fp"))
  fp.persist()
  t("fp materialize") { fp.count() }

  val bands = 8; val bandBits = 8; val bandMask = (1L << bandBits) - 1
  val banded = fp.withColumn("band", explode(array((0 until bands).map { bi =>
      struct(lit(bi).as("band_idx"),
        shiftright(col("fp"), bi * bandBits).bitwiseAND(bandMask).as("band_val"))
    }: _*)))
    .select(col("id"), col("band.band_idx").as("band_idx"),
      col("band.band_val").as("band_val"))

  // bucket histogram: top sizes + collision estimate (exact-match only)
  val hist = banded.groupBy("band_idx", "band_val").count().persist()
  t("bucket histogram") { hist.count() }
  val stats = hist.agg(sum(col("count") * col("count")).as("sum_sq"),
    max("count").as("max"), count(lit(1)).as("n_buckets")).collect()(0)
  println(s"[probe] exact-match collision pairs ~ ${stats.getLong(0)}, " +
    s"max bucket = ${stats.getLong(1)}, buckets = ${stats.getLong(2)}")
  hist.orderBy(col("count").desc).show(20, false)

  // probe-side expansion factor = bandBits+1 per row; total probed rows:
  println(s"[probe] probed rows = ${n * bands * (bandBits + 1)}")

  // time the candidate join alone (as in simhashVerifiedPairs)
  val probed = banded.withColumn("band_val",
    explode(array((lit(0L) +: (0 until bandBits).map(k => lit(1L << k)))
      .map(m => col("band_val").bitwiseXOR(m)): _*)))
  val a0 = fp.select(col("id"), col("fp"))
  val a = banded.join(a0, Seq("id")).select(col("band_idx"), col("band_val"),
    col("id").as("id_a"), col("fp").as("fp_a"))
  val b = probed.join(a0, Seq("id")).select(col("band_idx"), col("band_val"),
    col("id").as("id_b"), col("fp").as("fp_b"))
  val cand = a.join(b, Seq("band_idx", "band_val"))
    .filter(col("id_a") < col("id_b"))
  val nCand = t("candidate join (count only)") { cand.count() }
  println(s"[probe] raw collision rows (id_a<id_b) = $nCand")
  val nSurv = t("hamming filter") {
    cand.filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 15)
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b").count()
  }
  println(s"[probe] surviving pairs = $nSurv")

  // full operator for reference
  t("full q27 simhashVerifiedPairs") {
    Dedup.simhashVerifiedPairs(docs, "doc_id", "text",
      n = 2, maxDist = 15, threshold = 0.5).count()
  }
}

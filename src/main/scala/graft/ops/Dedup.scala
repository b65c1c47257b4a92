package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for the training-data pipeline (north-star
 * extension). Four tiers, cheapest first:
 *
 *  1. exact       — hash-groupBy on a normalized fingerprint (one shuffle);
 *  2. n-gram Jaccard — set similarity over word n-grams, blocked to avoid
 *                   the quadratic all-pairs blowup;
 *  3. MinHash+LSH — sub-quadratic near-dup at corpus scale: shingle →
 *                   minhash signature (map-side only) → band-bucket join →
 *                   verify candidates with exact Jaccard;
 *  4. SimHash    — 64-bit rotation-tolerant fingerprint, Hamming-distance
 *                   candidates via band blocking.
 *
 * Everything is murmur3 (`functions.hash`) / xxhash64 based — deterministic
 * across runs and cluster layouts, no RNG at execution time.
 */
object Dedup {

  // ---------------------------------------------------------------- exact

  /**
   * Exact dedup: one row per distinct normalized text; keeper = min id.
   * Scale shape: single hash-shuffle on the fingerprint; partial aggregation
   * collapses duplicates map-side, so the shuffle volume is ~#distinct docs.
   */
  def exact(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(text).as("fp"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ------------------------------------------------------- n-gram Jaccard

  /** Word n-gram shingles of `text` (n consecutive words, space-joined). */
  def shingles(text: Column, n: Int): Column = {
    val ws = TextAnalysis.words(text)
    when(size(ws) < n, array(concat_ws(" ", ws)))
      .otherwise(transform(
        sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
  }

  /** Jaccard similarity of two shingle-array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /**
   * All-pairs n-gram Jaccard within a blocking key (e.g. `source`): the
   * block bounds the quadratic term — at 100 TB you block on something with
   * bounded cardinality per value (domain, shard, LSH bucket) and the
   * self-join shuffles on the block key only.
   */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double): DataFrame = {
    // Pre-distinct the shingle sets once (map-side) and carry their sizes, so
    // the per-pair work is ONE array_intersect; |A∪B| = |A|+|B|−|A∩B| avoids
    // materializing the union array per pair (2-3× on the quadratic stage).
    val withShingles = docs.select(
      col(blockCol).as("block"), col(idCol).as("id"),
      array_distinct(shingles(col(textCol), n)).as("sh"))
      .withColumn("sz", size(col("sh")))
    val a = withShingles.select(col("block"), col("id").as("id_a"),
      col("sh").as("sh_a"), col("sz").as("sz_a"))
    val b = withShingles.select(col("block"), col("id").as("id_b"),
      col("sh").as("sh_b"), col("sz").as("sz_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"), col("jaccard"))
  }

  // --------------------------------------------------------- MinHash+LSH

  /**
   * MinHash signature: k seeded murmur3 min-hashes over the shingle set.
   * Per-row `transform`/`array_min` — computed map-side, no shuffle. The
   * seed enters as a second hash input, giving k independent hash families.
   */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(sh, s => hash(s, seed))))

  /**
   * LSH banding: split the k-wide signature into `bands` bands of k/bands
   * rows each; band hash = murmur3 of the band slice. Docs sharing any
   * (bandIdx, bandHash) become candidates.
   */
  def lshBands(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map { bnd =>
      struct(lit(bnd).as("band_idx"), hash(slice(sig, bnd * r + 1, r)).as("band_hash"))
    }: _*)
  }

  /**
   * MinHash+LSH near-duplicate pairs: shingle → signature → explode bands →
   * self-join on (band_idx, band_hash) → distinct candidate pairs → verify
   * with exact Jaccard ≥ threshold.
   *
   * Scale shape: the only shuffle is the band-bucket join, keyed by band
   * hash — ~bands rows per doc, so shuffle volume is O(bands·N), never the
   * O(N²) of all-pairs. Skewed buckets (boilerplate text) are the classic
   * hazard; AQE skew-join handles moderate skew, and a bucket-size cap
   * (`maxBucket`) drops degenerate mega-buckets like real pipelines do.
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      threshold: Double = 0.5,
                      maxBucket: Int = 1000): DataFrame = {
    // Shingles are hashed to ints ONCE; signatures, buckets and the verify
    // stage all work on int arrays — the candidate-generation shuffles carry
    // only (band keys, id) and the verify joins fetch the int sets by id,
    // so no stage ever shuffles the raw text/shingle strings.
    val base = docs.select(col(idCol).as("id"),
      array_distinct(transform(shingles(col(textCol), n), s => hash(s))).as("ih"))
      .withColumn("sz", size(col("ih")))
    val sigs = base
      .withColumn("sig", minhashSignature(col("ih"), k))
      .withColumn("band", explode(lshBands(col("sig"), k, bands)))
      .select(col("id"), col("band.band_idx"), col("band.band_hash"))
    // bucket membership → pair generation inside each bucket; the size cap
    // drops degenerate boilerplate mega-buckets (real-pipeline practice)
    val buckets = sigs.groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    val pairs = buckets
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val aSide = base.select(col("id").as("id_a"), col("ih").as("ih_a"), col("sz").as("sz_a"))
    val bSide = base.select(col("id").as("id_b"), col("ih").as("ih_b"), col("sz").as("sz_b"))
    pairs.join(aSide, "id_a").join(bSide, "id_b")
      .withColumn("inter", size(array_intersect(col("ih_a"), col("ih_b"))).cast(DoubleType))
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /**
   * 64-bit SimHash over word tokens: per bit, sum +1/−1 weighted by each
   * token's xxhash64 bit, then take the sign. Rotation/replacement-tolerant;
   * near-dups are pairs with small Hamming distance.
   */
  def simhash64(text: Column): Column =
    simhashFromHashes(transform(TextAnalysis.words(text), t => xxhash64(t)))

  /** SimHash from pre-computed 64-bit token hashes. Callers should
    * materialize the hash array as its own column first — each token is
    * hashed once, not once per bit. */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 64).map { i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)
      ) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * SimHash near-dup pairs with band blocking: split the 64-bit fingerprint
   * into 4×16-bit bands; pairs agreeing on ≥1 band (⇒ Hamming ≤ 48, and in
   * practice catching all pairs with distance ≤ 3 whp) are candidates,
   * verified by exact Hamming ≤ maxDist. Same O(bands·N) shuffle shape as
   * MinHash-LSH.
   */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val fp = docs
      .select(col(idCol).as("id"),
        transform(TextAnalysis.words(col(textCol)), t => xxhash64(t)).as("hs"))
      .select(col("id"), simhashFromHashes(col("hs")).as("fp"))
    val banded = fp.withColumn("band", explode(array((0 until 4).map { bi =>
        struct(lit(bi).as("band_idx"),
          shiftright(col("fp"), bi * 16).bitwiseAND(0xFFFFL).as("band_val"))
      }: _*)))
      .select(col("id"), col("fp"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val a = banded.select(col("band_idx"), col("band_val"),
      col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("fp_a"), col("fp_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

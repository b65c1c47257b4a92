package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Blocked string-similarity join: pairs of strings within edit distance
 * `maxDist`, found WITHOUT the all-pairs cross join — candidates are
 * generated only inside blocks that share a cheap key (here: a
 * caller-supplied blocking expression, e.g. the last token, a phonetic
 * code, a length band), then the exact Levenshtein verifies. The
 * canonical entity-resolution shape: O(Σ block²) with small blocks
 * instead of O(N²), and each block co-locates under one shuffle key.
 *
 * Recall contract: a pair is found iff BOTH sides share a block key —
 * the caller's blocking function defines the (documented) recall bound,
 * exactly like LSH banding does for Jaccard (ops/Dedup).
 *
 * NULL strings are dropped up front on both sides: levenshtein(NULL, _)
 * is NULL, so no NULL row can ever satisfy `dist <= maxDist` — but
 * without the filter they all collapse into one shared block key (most
 * blocking expressions, concat_ws included, map NULL to a constant) and
 * self-join there, an O(n_nulls²) block producing zero output.
 */
object StringSim {

  /** Distinct (id_a < id_b) pairs with levenshtein(a, b) ≤ maxDist and
    * equal block keys. Output: id_a, id_b, s_a, s_b, dist. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        blockKey: Column => Column,
                        maxDist: Int): DataFrame = {
    val nonNull = df.filter(col(strCol).isNotNull)
    val a = nonNull.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      blockKey(col(strCol)).as("__blk"))
    val b = nonNull.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
      blockKey(col(strCol)).as("__blk"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }

  /**
   * Data-SCALING multi-pass blocking for edit-distance joins over
   * multi-word strings — the fix for the fixed-cardinality-blocking
   * disease: a key like (last token, length band) over a FIXED
   * vocabulary has constant block COUNT, so block SIZE — and the
   * Σ block² candidate mass — grows linearly with the data (measured:
   * q75 15.2×, q108 7.35× work at 10× data in round 9). Here every
   * block key embeds n−1 of the string's n words, so key cardinality
   * grows WITH the corpus and blocks stay O(1):
   *
   *   pass D0:    key = the whole string                     — 1 key
   *   pass D1(i): key = (i, words with position i removed)   — n keys,
   *               only for n ≥ 2
   *   pass D2(i): key = (i, words i and i+1 removed)         — n−1 keys,
   *               only for n ≥ 3
   *
   * Two strings share a D1 key iff they are equal outside ONE word
   * position, a D2 key iff equal outside two ADJACENT positions — the
   * most common shapes of a small edit (a contiguous ≤ `maxDist`-char
   * edit spans at most two adjacent words; NON-adjacent multi-word
   * edits, e.g. two 1-char substitutions in separate words, are traded
   * away exactly as the recall contract below states). Same-position
   * equality also forces equal word COUNTS, so keys never cross shapes.
   * A pass is emitted ONLY when its remainder is non-empty: an empty
   * remainder (D1 of a 1-word string, D2 of a 2-word string) is one
   * UNIVERSAL block holding every string of that shape — the degenerate
   * all-pairs quadratic this operator exists to avoid. D0 keeps exact
   * duplicates findable for every shape.
   *
   * Recall contract (documented, like the banding bound in ops/Dedup):
   * found iff the pair differs in ≤ 1 word (n ≥ 2), ≤ 2 adjacent words
   * (n ≥ 3), or is an exact duplicate — word-count-changing edits and
   * both-words-changed 2-word pairs are traded away. The oracle pays
   * the same passes in SQL.
   *
   * 100 TB shape: explode to ~2n keys per row (map-side, no shuffle
   * amplification beyond the constant factor), ONE shuffle on the
   * drop key, candidate DISTINCT before the Levenshtein verify so a
   * pair caught by several passes is verified once.
   */
  def editDistancePairsWordDrop(df: DataFrame, idCol: String,
                                strCol: String, maxDist: Int): DataFrame = {
    val keyed = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        explode(wordDropKeys(col(strCol))).as("__blk"))
    val a = keyed.select(col("__blk"), col("__id").as("id_a"),
      col("__s").as("s_a"))
    val b = keyed.select(col("__blk"), col("__id").as("id_b"),
      col("__s").as("s_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
  }

  /**
   * VALUE-COLLAPSED word-drop pairs — the high-multiplicity fast path.
   * When the string domain is much smaller than the row count (TPC-H
   * part names: 64 distinct values over 20k rows at sf0.1 — ~312 copies
   * each), ROW-level blocking is doomed no matter the key: identical
   * strings must meet, so candidate mass is Σ multiplicity² ≈ N²/|domain|
   * — quadratic in rows at fixed domain. The scale-correct plan
   * collapses duplicates FIRST (one hash aggregate: distinct string,
   * its row count, its min id as a stable representative), runs the
   * word-drop blocking + Levenshtein verify over the DISTINCT strings
   * only, and lets the caller multiply counts back arithmetically
   * (cross pairs = n_a·n_b; within-string pairs = C(n,2) at dist 0).
   *
   * Output: one row per distinct candidate string pair with
   * lev ≤ maxDist, ordered s_a < s_b —
   * (s_a, s_b, id_a, id_b, n_a, n_b, dist) where id_* is the min
   * original id bearing that string (a deterministic representative for
   * graph ops) and n_* its multiplicity. Recall contract = the word-drop
   * contract (keys are string-determined, so collapsing loses nothing).
   *
   * 100 TB shape: one aggregate collapses rows to the distinct domain,
   * everything pairwise happens at domain scale; work is
   * O(rows + Σ distinct-block²), never O(Σ row-block²).
   */
  def editDistanceNamePairs(df: DataFrame, idCol: String, strCol: String,
                            maxDist: Int,
                            advisorHotFactor: Option[Long] = Some(16L))
      : DataFrame = {
    val names = df.filter(col(strCol).isNotNull)
      .groupBy(col(strCol).as("s"))
      .agg(min(col(idCol)).as("mid"), count(lit(1)).as("n"))
    val keyed = names.select(col("s"), col("mid"), col("n"),
      explode(wordDropKeys(col("s"))).as("__blk"))
    val a = keyed.select(col("__blk"), col("s").as("s_a"),
      col("mid").as("id_a"), col("n").as("n_a"))
    val b = keyed.select(col("__blk").as("__blk_b"), col("s").as("s_b"),
      col("mid").as("id_b"), col("n").as("n_b"))
    // The block-pair join is the OUTPUT-AMPLIFICATION shape AQE cannot
    // see (every shuffle block feeding it is small; the Σblock² product
    // explodes post-shuffle onto single reducers). `advisorHotFactor`
    // fronts it with [[Skew.advisedJoin]]: blocks past that multiple of
    // the mean frequency are salted over their own bucket count.
    // DEFAULT ON since round 13: [[Skew.maybeHot]]'s sketch pre-verdict
    // certifies the flat word-drop distributions in one cheap pass and
    // falls through to the IDENTICAL plain join, so the round-12 cost
    // that parked the advisor (its exact verdict re-computing the
    // exploded key frame: 2.0–2.6× the whole plain join on q108's flat
    // keys) is no longer paid — only a possibly-hot distribution
    // (adversarial boilerplate keys, coarse fallback passes, unknown
    // corpora) pays the exact advisor, which is where it wins. hf = 16
    // ≈ the measured ~2% pair-mass crossover; None = hard off.
    val joined = advisorHotFactor match {
      case Some(hf) => Skew.advisedJoin(a, b, "__blk", "__blk_b", hf)
      case None     => a.join(b, col("__blk") === col("__blk_b"))
    }
    joined
      .filter(col("s_a") < col("s_b"))
      .select(col("s_a"), col("s_b"), col("id_a"), col("id_b"),
        col("n_a"), col("n_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
  }

  /** The D0 (exact) + D1 (drop one word) + D2 (drop two adjacent words)
    * key array for one string — `\u0001`-joined (tag, position,
    * remainder) so remainder content can never collide across
    * tags/positions; D1/D2 guarded to non-empty remainders (see the
    * operator doc — an empty remainder is a universal block). */
  private[graft] def wordDropKeys(s: Column): Column = {
    val w = split(s, " ")
    val n = size(w)
    val none = array().cast("array<string>")
    val d0 = array(concat_ws("\u0001", lit("D0"), s))
    val d1 = when(n >= 2, transform(sequence(lit(1), n), i =>
        concat_ws("\u0001", lit("D1"), i.cast("string"),
          array_join(concat(
            slice(w, lit(1), i - lit(1)),
            slice(w, i + lit(1), n - i)), " "))))
      .otherwise(none)
    val d2 = when(n >= 3, transform(sequence(lit(1), n - 1), i =>
        concat_ws("\u0001", lit("D2"), i.cast("string"),
          array_join(concat(
            slice(w, lit(1), i - lit(1)),
            slice(w, i + lit(2), n - i - lit(1))), " "))))
      .otherwise(none)
    concat(d0, d1, d2)
  }

  /**
   * Size-capped variant: each natural block is split into deterministic
   * chunks of ≤ `cap` rows (row_number over the id within the block) and
   * the pairwise Levenshtein runs per (block, chunk). Work is O(N·cap) —
   * linear in the corpus with constant `cap` — where the uncapped join is
   * quadratic in the hottest block: one popular blocking key (an empty
   * title, a boilerplate host, a default value) otherwise concentrates
   * O(hot²) comparisons in ONE task, the classic last-straggler OOM.
   *
   * Recall contract (documented, like the banding bound in ops/Dedup and
   * the per-chunk bound of `ngramJaccardPairsChunked`): pairs are found
   * iff both sides land in the same chunk of the same block; cross-chunk
   * pairs inside a hot block are traded away for the bounded per-task
   * candidate count. Blocks of ≤ `cap` rows are a single chunk, so on
   * well-blocked data the output equals `editDistancePairs` exactly.
   *
   * 100 TB shape: one window shuffle on the block key to assign chunks,
   * then a self-join keyed by (block, chunk) whose per-key row count is
   * capped — no skew, no quadratic blowup.
   */
  def editDistancePairsChunked(df: DataFrame, idCol: String, strCol: String,
                               blockKey: Column => Column,
                               maxDist: Int, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("__nat")).orderBy(col("__id"))
    val keyed = df.filter(col(strCol).isNotNull)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        blockKey(col(strCol)).as("__nat"))
      .withColumn("__chunk", floor((row_number().over(w) - 1) / cap))
      .withColumn("__blk", concat(col("__nat"), lit("_"), col("__chunk")))
      .select(col("__blk"), col("__id"), col("__s"))
    val a = keyed.select(col("__blk"), col("__id").as("id_a"),
      col("__s").as("s_a"))
    val b = keyed.select(col("__blk"), col("__id").as("id_b"),
      col("__s").as("s_b"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .drop("__blk")
  }
}

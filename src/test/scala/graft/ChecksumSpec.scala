package graft

import org.apache.spark.sql.functions._

import graft.ops.Checksum

/** The checksum's contract: invariant under row order / partitioning,
  * sensitive to any value or cardinality change. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    ("s1", 1L, "alpha"), ("s1", 2L, "beta"), ("s1", 3L, "gamma"),
    ("s2", 4L, "delta"), ("s2", 5L, "epsilon"))
    .toDF("src", "id", "payload")

  private def sums(df: org.apache.spark.sql.DataFrame) =
    Checksum.tableChecksum(df, Seq("src"), Seq($"id", $"payload"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap

  test("invariant under shuffling and repartitioning") {
    val a = sums(base)
    val b = sums(base.orderBy($"payload".desc).repartition(7, $"id"))
    assert(a === b)
  }

  test("detects a corrupted row at identical cardinality") {
    val corrupted = base.withColumn("payload",
      when($"id" === 3L, lit("gamma2")).otherwise($"payload"))
    val a = sums(base); val b = sums(corrupted)
    assert(a("s1")._1 === b("s1")._1)      // same row count
    assert(a("s1")._2 !== b("s1")._2)      // different checksum
    assert(a("s2") === b("s2"))            // untouched group unchanged
  }

  test("detects a dropped row via the count") {
    val short = base.filter($"id" =!= 5L)
    val a = sums(base); val b = sums(short)
    assert(a("s2")._1 === 2L && b("s2")._1 === 1L)
  }

  test("digest distinguishes NULL position, NULL-vs-empty and delimiter injection") {
    def digestOf(a: Option[String], b: Option[String]): java.math.BigDecimal =
      Seq((a.orNull, b.orNull)).toDF("x", "y")
        .select(Checksum.rowDigest(Seq($"x", $"y")).as("d"))
        .collect().head.getDecimal(0)
    // ('a', NULL) vs (NULL, 'a') — concat_ws alone collapses both to "a"
    assert(digestOf(Some("a"), None) !== digestOf(None, Some("a")))
    // NULL vs empty string
    assert(digestOf(Some(""), None) !== digestOf(None, None))
    // delimiter smuggling: ("a|b", "c") vs ("a", "b|c")
    assert(digestOf(Some("a|b"), Some("c")) !== digestOf(Some("a"), Some("b|c")))
    // boundary smuggling across the length prefix: ("1", "1:1") vs ("1:1", "1")
    assert(digestOf(Some("1"), Some("1:1")) !== digestOf(Some("1:1"), Some("1")))
  }

  test("row digest stays within 48 bits and is non-negative") {
    val ds = base.select(Checksum.rowDigest(Seq($"id", $"payload")).as("d"))
      .collect().map(_.getDecimal(0))
    assert(ds.forall(d => d.signum() >= 0 &&
      d.compareTo(new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(48))) < 0))
  }
}

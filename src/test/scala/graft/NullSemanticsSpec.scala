package graft

import org.apache.spark.sql.functions._

import graft.ops.Joins

/** SURVEY §7.4 trap #1 — NOT IN three-valued logic vs left_anti. */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(Some(1L), Some(2L), None).toDF("k")

  test("NOT IN over a null-free subquery = plain anti join minus null-keyed lefts") {
    val right = Seq(2L).toDF("r")
    val faithful = Joins.notInFaithful(left, right, col("k"), col("r"))
      .collect().map(_.getAs[Any]("k")).toSet
    // SQL: 1 NOT IN (2) → true; 2 → false; NULL NOT IN (2) → NULL (excluded)
    assert(faithful === Set(1L))
    // plain left_anti would keep the NULL-keyed row — the divergence:
    val plain = left.join(right, col("k") === col("r"), "left_anti")
      .collect().map(_.getAs[Any]("k")).toSet
    assert(plain === Set(1L, null))
  }

  test("NOT IN returns zero rows when the subquery yields any NULL") {
    val right = Seq(Some(2L), None).toDF("r")
    val faithful = Joins.notInFaithful(left, right, col("k"), col("r"))
    assert(faithful.count() === 0)
  }

  test("notInFaithfulBig == notInFaithful == SQL across null/empty right sides") {
    val lefts = Seq(Some(1L), Some(2L), None).toDF("k")
    val rights = Map(
      "clean" -> Seq(Some(2L), Some(5L)).toDF("r"),
      "with-null" -> Seq(Some(2L), None).toDF("r"),
      "all-null" -> Seq(Option.empty[Long]).toDF("r"),
      "empty" -> Seq.empty[Option[Long]].toDF("r"))
    lefts.createOrReplaceTempView("nin_l")
    for ((tag, right) <- rights) {
      right.createOrReplaceTempView("nin_r")
      val sql = spark.sql(
        "SELECT k FROM nin_l WHERE k NOT IN (SELECT r FROM nin_r)")
        .collect().map(_.getAs[Any](0)).toSet
      val small = Joins.notInFaithful(lefts, right, col("k"), col("r"))
        .collect().map(_.getAs[Any](0)).toSet
      val big = Joins.notInFaithfulBig(lefts, right, col("k"), col("r"))
        .collect().map(_.getAs[Any](0)).toSet
      assert(small === sql, s"notInFaithful vs SQL on $tag")
      assert(big === sql, s"notInFaithfulBig vs SQL on $tag")
      assert(Joins.notInFaithfulBig(lefts, right, col("k"), col("r"))
        .columns.toSeq === lefts.columns.toSeq, s"schema on $tag")
    }
  }

  test("property: big and small NOT-IN variants agree on random nullable draws") {
    val rnd = new scala.util.Random(23)
    def multiset(df: org.apache.spark.sql.DataFrame): Map[Any, Int] =
      df.collect().map(r => if (r.isNullAt(0)) (null: Any) else r.getLong(0))
        .groupBy(identity).map { case (k, v) => k -> v.length }
    for (iter <- 0 until 30) {
      val l = Seq.fill(20)(
        if (rnd.nextInt(5) == 0) Option.empty[Long] else Some(rnd.nextInt(8).toLong))
        .toDF("k")
      val r = Seq.fill(rnd.nextInt(6))(
        if (rnd.nextInt(6) == 0) Option.empty[Long] else Some(rnd.nextInt(8).toLong))
        .toDF("r")
      val small = multiset(Joins.notInFaithful(l, r, col("k"), col("r")))
      val big = multiset(Joins.notInFaithfulBig(l, r, col("k"), col("r")))
      assert(big === small, s"draw $iter diverged")
    }
  }

  test("matches Spark SQL's own NOT IN on both cases") {
    left.createOrReplaceTempView("l")
    Seq(Some(2L), None).toDF("r").createOrReplaceTempView("r_null")
    Seq(2L).toDF("r").createOrReplaceTempView("r_clean")
    val sqlClean = spark.sql("SELECT k FROM l WHERE k NOT IN (SELECT r FROM r_clean)")
      .collect().map(_.get(0)).toSet
    val sqlNull = spark.sql("SELECT k FROM l WHERE k NOT IN (SELECT r FROM r_null)")
    assert(Joins.notInFaithful(left, Seq(2L).toDF("r"), col("k"), col("r"))
      .collect().map(_.get(0)).toSet === sqlClean)
    assert(sqlNull.count() === 0)
  }
}

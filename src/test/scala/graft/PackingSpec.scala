package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Packing

/** The two-phase distributed token prefix-sum must equal the naive
  * single-reducer global window row-for-row, and the packing rule's
  * invariants must hold (shards consecutive, every doc assigned once,
  * shard starts aligned to the budget grid). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packByBudget == naive global-window cumsum, shards well-formed") {
    val rnd = new scala.util.Random(7)
    val docs = (1 to 1000).map(i => (i.toLong, 1 + rnd.nextInt(500)))
      .toDF("id", "tok")
    val packed = Packing.packByBudget(docs, $"tok", budget = 2048L, $"id")
      .select($"id", $"tok", $"running_start", $"shard_id")
    val got = packed.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // naive oracle: one global window (fine at spec scale)
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = docs
      .withColumn("start", coalesce(sum($"tok".cast("long")).over(w), lit(0L)))
      .withColumn("shard", expr("CAST(start DIV 2048L AS BIGINT)"))
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got === expected)
    packed.unpersist()
    // invariants: every doc exactly once; shard ids contiguous from 0;
    // doc order within ascending shard order
    val shards = got.map(_._3)
    assert(got.length === 1000)
    assert(shards.min === 0L && shards.toSet === (0L to shards.max).toSet)
    assert(shards.sameElements(shards.sorted), "shards follow doc order")
  }

  test("single doc larger than the budget still lands in exactly one shard") {
    val docs = Seq((1L, 10), (2L, 9999), (3L, 10)).toDF("id", "tok")
    val packed = Packing.packByBudget(docs, $"tok", budget = 100L, $"id")
    val got = packed.select($"id", $"shard_id").orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // doc 2 starts at 10 (shard 0); doc 3 starts at 10009 -> shard 100
    assert(got === Seq((1L, 0L), (2L, 0L), (3L, 100L)))
    packed.unpersist()
  }
}

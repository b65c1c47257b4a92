package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ops.Bucketing

/** Co-located bucketed joins: the write-once shuffle must be amortized —
  * the join plan over two co-bucketed tables contains NO exchange. */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val setup: Unit = {
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", buckets = 4)
  }

  test("join of co-bucketed tables plans with zero shuffle exchanges") {
    setup
    val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
      "o_orderkey")
    val exchanges = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"expected no exchange, plan:\n${joined.queryExecution.executedPlan}")
    // and it computes the right thing
    val viaBuckets = joined.count()
    val plain = Tables.lineitem(spark, dir).join(
      Tables.orders(spark, dir),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(viaBuckets === plain)
  }

  test("aggregation on the bucket key also avoids the exchange") {
    setup
    val agg = spark.table("b_lineitem").groupBy("o_orderkey")
      .agg(sum("l_quantity").as("q"))
    agg.collect()
    val exchanges = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty)
  }
}

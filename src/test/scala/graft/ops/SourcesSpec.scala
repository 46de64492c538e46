package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  test("S1: CSV scan uses the pinned schema, no inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    val f = dir.resolve("orders.csv")
    java.nio.file.Files.writeString(f,
      "order_id,product_id,add_to_cart_order,reordered\n" +
        "1,100,1,0\n1,200,2,1\n2,100,1,0\n")
    val df = Sources.csv(spark, f.toString, Sources.orderProductsSchema)
    // file sources force nullable=true; names and types must pin exactly
    assert(df.schema.map(f => f.name -> f.dataType) ==
      Sources.orderProductsSchema.map(f => f.name -> f.dataType))
    assert(df.count() == 3)
    assert(df.schema("order_id").dataType == LongType)
  }

  test("S1: malformed rows become nulls (caught by Q1), not type drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv2")
    val f = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(f,
      "order_id,product_id,add_to_cart_order,reordered\n" +
        "1,not_a_number,1,0\n")
    val df = Sources.csv(spark, f.toString, Sources.orderProductsSchema)
    // schema holds; the bad cell is null — exactly what checkNoNulls gates
    assert(df.schema("product_id").dataType == LongType)
    intercept[Quality.QualityError] {
      Quality.checkNoNulls(df, "product_id")
    }
  }

  test("S2/S6: parquet round-trip preserves schema and rows") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
    val out = java.nio.file.Files.createTempDirectory("graft-pq").toString
    Sources.writeParquet(li.limit(100), s"$out/li")
    val back = spark.read.parquet(s"$out/li")
    assert(back.count() == 100)
    assert(back.schema == li.schema)
  }

  test("partitioned write: filtered read prunes partitions at planning time") {
    val ev = Sources.table(spark, sf("sf0.001"), "events")
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Sources.writeParquetPartitioned(ev, s"$out/ev", Seq("event_type"))
    val one = spark.read.parquet(s"$out/ev")
      .filter(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("event_type"), plan)
    assert(one.count() == ev.filter(col("event_type") === "click").count())
  }

  test("bucketed tables: co-located join runs with NO exchange") {
    val li = Sources.table(spark, sf("sf0.001"), "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val ord = Sources.table(spark, sf("sf0.001"), "orders")
      .select("o_orderkey", "o_totalprice")
    Sources.writeBucketed(li, "li_b", "l_orderkey", 4)
    Sources.writeBucketed(ord, "ord_b", "o_orderkey", 4)
    // force a merge join (broadcast would hide the bucketing benefit)
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n$plan")
    // and the result is the same as the unbucketed join
    assert(joined.count() ==
      li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
  }
}

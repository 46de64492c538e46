package graft.functions

import graft.SparkSpec
import graft.ops.{Portable, Sources, Text}
import org.apache.spark.sql.functions._

import scala.util.Random

class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  test("value-identical to the Text.simhash HOF form on random hash arrays") {
    val rnd = new Random(11)
    val rows = Seq.fill(300) {
      Array.fill(rnd.nextInt(40))(rnd.nextLong() & ((1L << 60) - 1))
    } :+ Array.empty[Long] // empty array: all 60 bits set in both forms
    val df = rows.toDF("hs")
    val cmp = df.select(SimHash60($"hs").as("fast"),
      Text.simhash("hs").as("slow"))
    assert(cmp.filter($"fast" =!= $"slow" ||
      ($"fast".isNull =!= $"slow".isNull)).count() == 0)
    assert(cmp.filter($"fast" === (1L << 60) - 1).count() >= 1)
  }

  test("matches the relational Dedup.simhashes fingerprints on the fixture") {
    val docs = Sources.table(spark, sf("sf0.001"), "documents").limit(50)
    val perRow = docs.select($"doc_id",
      SimHash60(transform(Text.tokens($"text"),
        w => Portable.seededHash(w))).as("simhash"))
    val relational = graft.ops.Dedup.simhashes(docs, "doc_id", "text")
    assert(perRow.except(relational).count() == 0)
    assert(relational.except(perRow).count() == 0)
  }

  test("null array -> null; null element -> null") {
    val df = Seq(
      (1L, Array(1L, 2L)), (2L, null.asInstanceOf[Array[Long]])
    ).toDF("id", "hs")
      .union(spark.sql(
        "SELECT 3L AS id, array(5L, CAST(NULL AS BIGINT)) AS hs"))
    val r = df.select($"id", SimHash60($"hs").as("s"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(!r(1L) && r(2L) && r(3L))
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    // a plain array<long> input: the expression itself must stay inside
    // WholeStageCodegen (the token-hash TRANSFORM feeding it in
    // production is a HOF and lives outside codegen either way)
    val df = spark.range(100)
      .select(array($"id", $"id" + 1, $"id" * 3).as("hs"))
    val plan = df.select(SimHash60($"hs").as("s"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix on Project marks a WholeStageCodegen span
    assert(plan.contains("*(1) Project [simhash60("), plan)
  }
}

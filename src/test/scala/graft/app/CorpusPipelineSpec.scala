package graft.app

import graft.SparkSpec
import graft.ops.Text
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  private def docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")

  test("curate: monotone funnel, budgeted normalized chunks, dup-free survivors") {
    val r = CorpusPipeline.curate(docs)
    val f = r.funnel.toMap
    val order = Seq("input", "normalized_non_empty", "language", "quality",
      "exact_dedup", "near_dedup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(f(b) <= f(a), s"funnel grew: $a=${f(a)} -> $b=${f(b)}")
    }
    assert(f("near_dedup") > 0, "funnel filtered everything out")
    // every surviving doc is non-empty, so it yields >= 1 chunk
    assert(f("chunks") >= f("near_dedup"))
    // chunk budget respected, no empty chunks
    assert(r.chunks.filter(col("n_tokens") > 64 || col("n_tokens") <= 0)
      .count() == 0)
    // chunk doc_ids are exactly the near-dedup survivors
    val survivors = r.chunks.select("doc_id").distinct()
    assert(survivors.count() == f("near_dedup"))
    // survivors are exact-dup free on normalized text
    val texts = docs.join(survivors, Seq("doc_id"))
      .select(Text.normalize(col("text")).as("t"))
    assert(texts.count() == texts.distinct().count())
  }

  test("curateToParquet: source-partitioned sink round-trips the chunk rows") {
    val out = java.nio.file.Files.createTempDirectory("graft-corpus").toString
    val r = CorpusPipeline.curateToParquet(docs, out)
    val back = spark.read.parquet(out)
    assert(back.count() == r.funnel.toMap.apply("chunks"))
    assert(back.columns.contains("source") && back.columns.contains("chunk"))
  }
}

package graft.functions

import graft.SparkSpec
import graft.ops.Portable
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val M = BigInt(MinHashSig.Prime)

  test("mix == (a*h + b) mod (2^61-1) in BigInt reference arithmetic") {
    // bound-stressing operands: coefA maxes at 2^60, Hash60 at 2^60-1
    val hs = Seq(0L, 1L, 7L, (1L << 59) - 3, (1L << 60) - 1)
    val coefs = Seq(
      (1L, 0L), (1L << 60, (1L << 60) - 1),
      (MinHashSig.coefA(0), MinHashSig.coefB(0)),
      (MinHashSig.coefA(15), MinHashSig.coefB(15)))
    for (h <- hs; (a, b) <- coefs) {
      val want = ((BigInt(a) * BigInt(h) + BigInt(b)) mod M).toLong
      assert(MinHashSig.mix(h, a, b) == want,
        s"mix($h, $a, $b): got ${MinHashSig.mix(h, a, b)}, want $want")
    }
  }

  test("coefficients derive from Hash60 and are deterministic") {
    val a0 = Hash60.compute(Array(UTF8String.fromString("minhash_a"),
      UTF8String.fromString("0"))) + 1L
    assert(MinHashSig.coefA(0) == a0)
    assert(MinHashSig.coefA(3) != MinHashSig.coefA(4))
    assert((0 until 32).forall(p =>
      MinHashSig.coefA(p) >= 1 && MinHashSig.coefA(p) <= (1L << 60)))
  }

  test("signature == per-perm min of mix over per-shingle Hash60 bases") {
    val docs = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("x y z")),
      (3L, Seq("unicode ü 中", "", "a b c"))
    ).toDF("doc_id", "shingles")
    val perms = 16
    val got = docs.select($"doc_id", MinHashSig($"shingles", perms).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // reference: base via the composed md5 chain (Hash60Spec pins
    // compute == composed), then the BigInt mix
    val bases = docs.select($"doc_id", explode($"shingles").as("s"))
      .select($"doc_id", Portable.composedSeededHash($"s").as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
    for ((id, rows) <- bases; p <- 0 until perms) {
      val want = rows.map { case (_, h) =>
        ((BigInt(MinHashSig.coefA(p)) * h + MinHashSig.coefB(p)) mod M).toLong
      }.min
      assert(got(id)(p) == want, s"doc $id perm $p")
    }
  }

  test("null semantics: null/empty arrays -> null; null elements skipped") {
    val df = Seq(
      (1L, Some(Seq(Some("a"), None))),
      (2L, Some(Seq.empty[Option[String]])),
      (3L, None),
      (4L, Some(Seq[Option[String]](None)))
    ).toDF("doc_id", "shingles")
    val sig = df.select($"doc_id", MinHashSig($"shingles", 4).as("sig"))
    assert(sig.filter($"sig".isNotNull).as[(Long, Seq[Long])]
      .collect().map(_._1).toSet == Set(1L))
    // null-element skipping: ["a", null] signs identically to ["a"]
    val just = Seq((1L, Seq("a"))).toDF("doc_id", "shingles")
      .select(MinHashSig($"shingles", 4)).head().getSeq[Long](0)
    val withNull = sig.filter($"doc_id" === 1).head().getSeq[Long](1)
    assert(just == withNull)
  }

  test("codegen path on a parquet scan agrees with interpreted eval") {
    val docs = graft.ops.Sources.table(spark, sf("sf0.001"), "documents")
      .limit(50)
      .select($"doc_id", split($"text", " ").as("shingles"))
    val df = docs.select($"doc_id", MinHashSig($"shingles", 8).as("sig"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1)"))
    val viaScan = df.as[(Long, Seq[Long])].collect().toMap
    val local = docs.as[(Long, Seq[String])].collect()
    for ((id, sh) <- local) {
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        sh.map(UTF8String.fromString).toArray[Any])
      val want = MinHashSig.compute(arr, 8).toLongArray().toSeq
      assert(viaScan(id) == want, s"doc $id")
    }
  }
}

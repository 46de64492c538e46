package graft.conf

import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {

  test("recommendedConfs: the documented production contract, validated") {
    val c = Sessions.recommendedConfs(2048, 128L << 20)
    // the Barrier reliable-mode GC contract (context-creation-time conf)
    assert(c("spark.cleaner.referenceTracking.cleanCheckpoints") == "true")
    // AQE + skew handling on
    assert(c("spark.sql.adaptive.enabled") == "true" &&
      c("spark.sql.adaptive.skewJoin.enabled") == "true" &&
      c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    // sized, not defaulted
    assert(c("spark.sql.shuffle.partitions") == "2048")
    assert(c("spark.sql.files.maxPartitionBytes") == (128L << 20).toString)
    // oracle-parity timestamp semantics
    assert(c("spark.sql.session.timeZone") == "UTC" &&
      c("spark.sql.legacy.parquet.nanosAsLong") == "true")
    intercept[IllegalArgumentException] { Sessions.recommendedConfs(0, 1L << 30) }
    intercept[IllegalArgumentException] { Sessions.recommendedConfs(64, 1024L) }
  }
}

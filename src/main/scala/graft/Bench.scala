package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the engine's recommended production confs (AQE + coalescing +
    // skew-join, UTC, nanos-as-long) — the bench measures the session
    // posture the scaladocs prescribe, not a bare-defaults session
    val spark = graft.conf.Sessions.recommendedConfs(
        shufflePartitions = cpus.toInt, maxPartitionBytes = 128L << 20)
      .foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.ui.enabled", "false")) {
        case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: the first query in a fresh JVM otherwise absorbs
    // 5-8s of classloading/codegen/parquet-footer setup and its number
    // becomes uninterpretable. q1 touches the scan + shuffle + agg
    // machinery; a 4-row Word2Vec fit touches the MLlib trainer's
    // classload/codegen path (q37's pass-1 number was otherwise ~2x its
    // steady state — measuring initialization, not the query). Failures
    // here surface in the timed run instead.
    try {
      val w = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      w.select(xxhash64(w.columns.toIndexedSeq.map(col): _*).as("__h"))
        .agg(bit_xor(col("__h"))).collect()
      import spark.implicits._
      val toy = Seq(Seq("a", "b"), Seq("a", "c"), Seq("b", "c"), Seq("a", "b"))
        .toDF("tokens")
      graft.ml.Prod2Vec.train(toy,
        graft.ml.Prod2Vec.Params(vectorSize = 4, minCount = 1,
          numPartitions = 1)).getVectors.count()
    } catch { case _: Throwable => () }
    var errors = Map.empty[String, String]
    // sorted order: deterministic run sequence run-to-run and round-to-
    // round (Map iteration order is arbitrary and changes with the
    // query count)
    val names = SparkEntry.queries.keys.toSeq.sorted
    // (elapsed seconds, error message if the pass failed)
    def timeOnce(name: String): (Double, Option[String]) = {
      // collect the previous query's garbage OUTSIDE the timed region —
      // recorded r2-r4 benches all carried late-run GC noise (a 0.4 s
      // query billed 5 s for its predecessors' allocations)
      System.gc()
      val t0 = System.nanoTime()
      val err = try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // Checksum over EVERY output column — a bare .count() lets
        // Catalyst prune expensive computed columns out of the plan, so
        // the "benchmark" would never evaluate them.
        // bit_xor fold: order-independent and cannot overflow (sum of
        // xxhash64 Longs throws ARITHMETIC_OVERFLOW under ANSI mode).
        df.select(xxhash64(df.columns.toIndexedSeq.map(col): _*).as("__h"))
          .agg(bit_xor(col("__h"))).collect()
        None
      } catch {
        case e: Throwable =>
          Some(e.toString.replaceAll("""["\\\n\r\t]""", " ").take(200))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // Two full in-process passes, report the per-query MIN over the
    // passes that SUCCEEDED: any transient contention (driver activity,
    // JIT recompiles, stray GC) inflates one pass but almost never the
    // same query in both — the min is the steady-state cost,
    // reproducible run-to-run within ~15%. A failed pass's elapsed time
    // measures the failure, not the query, so it never wins the min.
    // `errors` lists a query ONLY when no pass succeeded (its `queries`
    // time then measures failures, not the query) — so `errors`
    // membership IS the per-query failed/measured signal; a both-fail
    // entry keeps both passes' messages.
    val pass1 = names.map(n => n -> timeOnce(n)).toMap
    val pass2 = names.map(n => n -> timeOnce(n)).toMap
    val results = names.map { n =>
      val (ta, ea) = pass1(n)
      val (tb, eb) = pass2(n)
      n -> ((ea, eb) match {
        case (None, Some(_)) => ta
        case (Some(_), None) => tb
        case _               => math.min(ta, tb)
      })
    }
    errors = names.flatMap { n =>
      (pass1(n)._2, pass2(n)._2) match {
        case (Some(e1), Some(e2)) =>
          Some(n -> (if (e1 == e2) e1 else s"pass1: $e1 | pass2: $e2"))
        case _ => None
      }
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // pass totals recorded alongside the min-fold: a reader can judge the
    // run's own noise level (passes agreeing within ~15% = trustworthy;
    // divergent passes = contended machine, rerun before comparing)
    val t1 = pass1.values.map(_._1).sum
    val t2 = pass2.values.map(_._1).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","pass_totals":[$t1,$t2],"queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // Also persist to a file: the driver's artifact captures only the
    // log TAIL, which truncated away the totals + 88 per-query rows in
    // round 7 once the suite outgrew the capture window. The file is the
    // truncation-proof record.
    try {
      val dir = java.nio.file.Paths.get("target")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("bench.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: $e") }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with matching DuckDB-runnable SQL in `oracleSql`.
  *
  * Conventions for oracle parity:
  *  - every query ends in a full deterministic ORDER BY (both sides), so
  *    row order can never break the hash compare;
  *  - column names are aliased identically on both sides;
  *  - window-function outputs (`row_number`) are cast to BIGINT to match
  *    DuckDB's type;
  *  - no engine-specific functions in oracle-facing queries.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Sources.table(s, dir, name)

  /** Vocab size including the reserved UNK index — kept below the distinct
    * part count of every fixture SF so the OOV path is exercised. */
  val VocabK = 100

  /** Skip-gram window (reference `config/prod2vec_config.yaml:26`; N1). */
  val WindowW = 4
  /** Basket cap (reference `config/prod2vec_config.yaml:28`). */
  val MaxBasketLen = 50
  /** Negatives per positive pair (`config/prod2vec_config.yaml:27`). */
  val NumNs = 4
  /** Subsampling factor (Keras default 1e-5 is tuned for 35k-word corpora;
    * 1e-3 keeps fixture-scale pair counts meaningful). */
  val SamplingFactor = 1e-3
  /** Neighbors per target in the similarity reports. */
  val TopK = 10

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top co-purchase neighbors per part (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q14_copurchase_topk")(spark, "/root/testdata/sf0.001")

  // ---- shared building blocks ------------------------------------------

  /** Top-(K-1) vocab with dense idx 1..K-1 (UNK reserved at 0), pinned
    * tiebreak (cnt DESC, product_id ASC). SURVEY §2.4 A2+A3. */
  private def vocab(s: SparkSession, dir: String): DataFrame =
    Vocab.withIndex(Vocab.topK(t(s, dir, "lineitem"), "l_partkey", VocabK))

  private val vocabSqlCte =
    s"""WITH vocab AS (
       |  SELECT product_id AS pid, cnt, idx FROM (
       |    SELECT l_partkey AS product_id, count(*) AS cnt,
       |           row_number() OVER (ORDER BY count(*) DESC, l_partkey ASC) AS idx
       |    FROM lineitem GROUP BY l_partkey
       |  ) v WHERE idx <= ${VocabK - 1}
       |)""".stripMargin

  /** Skip-gram positive pairs (A6'+P7+A9): encode lineitem through the
    * vocab, shuffled-deterministic positions per order (seeded hash order,
    * l_partkey tiebreak — hash ties can only occur between rows of the
    * same item, so the pair multiset is well-defined), cap at
    * [[MaxBasketLen]], window [[WindowW]].
    *
    * Zero-shuffle-after-groupBy form: one hash agg builds the ordered
    * basket arrays, pair expansion is a per-row array expression
    * ([[Pairs.orderedBaskets]] + [[Pairs.skipGramPairsFromBaskets]]) —
    * the relational window+self-join form ([[Pairs.positions]] +
    * [[Pairs.skipGramPairs]]) computes the identical pair multiset
    * (PairsSpec proves it) but shuffles twice. */
  private def pairs(s: SparkSession, dir: String): DataFrame = {
    val enc = Vocab.encode(t(s, dir, "lineitem"), "l_partkey", vocab(s, dir))
    val baskets = Pairs.orderedBaskets(enc, "l_orderkey", "idx",
      Seq(Portable.seededHash(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey")).as("__h"), col("l_partkey").as("__pid")),
      MaxBasketLen)
    Pairs.skipGramPairsFromBaskets(baskets, WindowW)
  }

  /** DuckDB CTEs mirroring [[pairs]] bit-for-bit (extends [[vocabSqlCte]]
    * with enc → seq → pairs). */
  private val pairsSqlCte: String = {
    val h = Portable.sqlHash("order_id", "ln", "pid")
    s"""$vocabSqlCte,
       |enc AS (
       |  SELECT l.l_orderkey AS order_id, l.l_linenumber AS ln,
       |         l.l_partkey AS pid, coalesce(v.idx, 0) AS item
       |  FROM lineitem l LEFT JOIN vocab v ON l.l_partkey = v.pid
       |),
       |seq AS (
       |  SELECT order_id, item, pos FROM (
       |    SELECT order_id, item,
       |           row_number() OVER (PARTITION BY order_id
       |             ORDER BY $h, pid) - 1 AS pos
       |    FROM enc
       |  ) WHERE pos < $MaxBasketLen
       |),
       |pairs AS (
       |  SELECT t.order_id, t.pos AS pos_t, c.pos AS pos_c,
       |         t.item AS target, c.item AS context
       |  FROM seq t JOIN seq c ON t.order_id = c.order_id
       |  WHERE t.pos <> c.pos AND abs(t.pos - c.pos) <= $WindowW
       |    AND t.item <> 0 AND c.item <> 0
       |)""".stripMargin
  }

  // ---- queries ----------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1+P1+A1-ish pricing rollup (scan, project, hash agg) — also the
    // bench headline. Catalyst prunes the scan to the 6 referenced columns.
    "q1_pricing_summary" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_base_price"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
          avg($"l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // A2: frequency count + top-K with pinned tiebreak (SURVEY N2).
    "q2_vocab_topk" -> ((s, dir) => {
      Vocab.topK(t(s, dir, "lineitem"), "l_partkey", VocabK)
    }),

    // A3: dense index assignment, UNK reserved at 0.
    "q3_vocab_index" -> ((s, dir) => {
      vocab(s, dir).withColumn("idx", col("idx").cast("long"))
        .orderBy("idx")
    }),

    // J4+A4: integer-encode the fact table through the vocab, OOV → 0.
    // Broadcast left join — fact side streams, no shuffle.
    "q4_unk_recode" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Vocab.encode(li, "l_partkey", vocab(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey").as("product_id"), col("idx").cast("long").as("idx"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A4 standalone: OOV occurrence count (unk_count, data_prep.py:103).
    "q5_unk_count" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val v = vocab(s, dir).select(col("product_id"))
      li.join(broadcast(v), li("l_partkey") === v("product_id"), "left_anti")
        .agg(count(lit(1)).as("unk_count"))
    }),

    // A1 canonical: group-collect baskets (sorted-array string form so the
    // oracle hash is order-insensitive within the basket).
    "q6_baskets" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_orderkey".as("order_id"))
        .agg(count(lit(1)).as("basket_size"),
          concat_ws(",", sort_array(collect_list($"l_partkey"))).as("basket"))
        .orderBy("order_id")
    }),

    // Q1 (quality): one-pass per-column null profile of lineitem.
    "q7_quality_nulls" -> ((s, dir) => {
      Quality.report(t(s, dir, "lineitem"))
    }),

    // Q5 (quality): primary-key uniqueness on the catalog dim.
    "q8_pk_check" -> ((s, dir) => {
      t(s, dir, "part")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("p_partkey")).as("n_distinct"))
    }),

    // P2/A6: distinct-count gates (data_quality_checks.py:45-46).
    "q9_distinct_counts" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("n_products"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    // A6'+P7+A9: skip-gram pair co-occurrence counts (deterministic
    // shuffled positions, window W, UNK excluded).
    "q10_skipgram_cooc" -> ((s, dir) => {
      pairs(s, dir)
        .groupBy(col("target"), col("context"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("target", col("target").cast("long"))
        .withColumn("context", col("context").cast("long"))
        .orderBy("target", "context")
    }),

    // A8: Zipf-rank subsampling table (Keras make_sampling_table formula).
    "q11_sampling_table" -> ((s, dir) => {
      Pairs.samplingTable(s, VocabK, SamplingFactor)
        .withColumn("keep_prob", round(col("keep_prob"), 9))
        .orderBy("idx")
    }),

    // A8 applied: pairs surviving the frequent-target subsampling draw.
    "q12_subsampled_pairs" -> ((s, dir) => {
      Pairs.subsample(pairs(s, dir), Pairs.samplingTable(s, VocabK, SamplingFactor))
        .groupBy(col("target").cast("long").as("target"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("target")
    }),

    // A10+A11: log-uniform negatives per positive pair, exploded.
    "q13_negatives" -> ((s, dir) => {
      Pairs.negatives(pairs(s, dir), NumNs, VocabK)
        .select(col("order_id"), col("pos_t").cast("long").as("pos_t"),
          col("pos_c").cast("long").as("pos_c"),
          col("target").cast("long").as("target"),
          col("context").cast("long").as("context"),
          posexplode(col("negatives")).as(Seq("k", "neg")))
        .withColumn("k", col("k").cast("long"))
        .withColumn("neg", col("neg").cast("long"))
        .orderBy("order_id", "pos_t", "pos_c", "k")
    }),

    // §7.2 flagship (M3 relational): top-K co-purchase neighbors per part,
    // ranked by co-occurrence, names joined back (J2+J3).
    "q14_copurchase_topk" -> ((s, dir) => {
      val topk = Similarity.coPurchaseTopK(pairs(s, dir), TopK)
      val v = vocab(s, dir).select(col("idx"), col("product_id"))
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      topk
        .join(broadcast(v.withColumnRenamed("idx", "target")
          .withColumnRenamed("product_id", "target_pid")), Seq("target"))
        .join(broadcast(v.withColumnRenamed("idx", "context")
          .withColumnRenamed("product_id", "neighbor_pid")), Seq("context"))
        .join(broadcast(p.withColumnRenamed("p_partkey", "target_pid")
          .withColumnRenamed("p_name", "target_name")), Seq("target_pid"))
        .join(broadcast(p.withColumnRenamed("p_partkey", "neighbor_pid")
          .withColumnRenamed("p_name", "neighbor_name")), Seq("neighbor_pid"))
        .select(col("target_pid"), col("neighbor_pid"), col("target_name"),
          col("neighbor_name"), col("cnt"), col("rnk").cast("long").as("rnk"))
        .orderBy("target_pid", "rnk")
    }),

    // A7: ordered "; "-concat neighbor report per target (model_train.py:48).
    "q15_neighbor_report" -> ((s, dir) => {
      val ranked = queries("q14_copurchase_topk")(s, dir)
        .select(col("target_pid").as("target"),
          col("neighbor_name").as("name"), col("rnk"))
      Similarity.neighborReport(ranked)
        .withColumnRenamed("target", "target_pid")
        .orderBy("target_pid")
    }),

    // J5/M3 vector form: exact cosine top-K of 5 probe vectors against the
    // embeddings corpus (brute-force ANN baseline, SURVEY §7.4).
    "q16_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 5), TopK)
        .withColumn("rnk", col("rnk").cast("long"))
        .orderBy("probe_id", "rnk")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_base_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
        |  avg(l_quantity) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_vocab_topk" ->
      s"""SELECT l_partkey AS product_id, count(*) AS cnt
         |FROM lineitem GROUP BY l_partkey
         |ORDER BY cnt DESC, product_id ASC LIMIT ${VocabK - 1}""".stripMargin,

    "q3_vocab_index" ->
      s"""$vocabSqlCte
         |SELECT pid AS product_id, cnt, idx FROM vocab ORDER BY idx""".stripMargin,

    "q4_unk_recode" ->
      s"""$vocabSqlCte
         |SELECT l.l_orderkey, l.l_linenumber, l.l_partkey AS product_id,
         |       coalesce(v.idx, 0) AS idx
         |FROM lineitem l LEFT JOIN vocab v ON l.l_partkey = v.pid
         |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q5_unk_count" ->
      s"""$vocabSqlCte
         |SELECT count(*) AS unk_count
         |FROM lineitem l LEFT JOIN vocab v ON l.l_partkey = v.pid
         |WHERE v.pid IS NULL""".stripMargin,

    "q6_baskets" ->
      """SELECT l_orderkey AS order_id, count(*) AS basket_size,
        |  array_to_string(list(l_partkey ORDER BY l_partkey), ',') AS basket
        |FROM lineitem GROUP BY l_orderkey ORDER BY order_id""".stripMargin,

    "q7_quality_nulls" -> {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      "SELECT count(*) AS n_rows, " +
        cols.map(c =>
          s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_$c")
          .mkString(", ") +
        " FROM lineitem"
    },

    "q8_pk_check" ->
      "SELECT count(*) AS n_rows, count(DISTINCT p_partkey) AS n_distinct FROM part",

    "q9_distinct_counts" ->
      """SELECT count(DISTINCT l_partkey) AS n_products,
        |       count(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin,

    "q10_skipgram_cooc" ->
      s"""$pairsSqlCte
         |SELECT target, context, count(*) AS cnt
         |FROM pairs GROUP BY target, context
         |ORDER BY target, context""".stripMargin,

    "q11_sampling_table" ->
      s"""SELECT idx, round(keep_prob, 9) AS keep_prob FROM (
         |${Pairs.samplingTableSql(VocabK, SamplingFactor)}
         |) ORDER BY idx""".stripMargin,

    "q12_subsampled_pairs" ->
      s"""$pairsSqlCte,
         |sampling AS (
         |${Pairs.samplingTableSql(VocabK, SamplingFactor)}
         |)
         |SELECT p.target, count(*) AS n_pairs
         |FROM pairs p JOIN sampling s ON p.target = s.idx
         |WHERE ${Portable.sqlUnif("p.order_id", "p.pos_t", "p.target")} < s.keep_prob
         |GROUP BY p.target ORDER BY p.target""".stripMargin,

    "q13_negatives" -> {
      val u = Portable.sqlUnif("order_id", "pos_t", "pos_c", "k")
      s"""$pairsSqlCte
         |SELECT order_id, pos_t, pos_c, target, context, k,
         |       least(${VocabK - 1},
         |         CAST(floor(exp($u * ln(${VocabK + 1}.0))) AS BIGINT) - 1) AS neg
         |FROM pairs, (SELECT unnest(generate_series(0, ${NumNs - 1})) AS k) ks
         |ORDER BY order_id, pos_t, pos_c, k""".stripMargin
    },

    "q14_copurchase_topk" ->
      s"""$pairsSqlCte,
         |cooc AS (
         |  SELECT target, context, count(*) AS cnt
         |  FROM pairs GROUP BY target, context
         |),
         |topk AS (
         |  SELECT target, context, cnt,
         |         row_number() OVER (PARTITION BY target
         |           ORDER BY cnt DESC, context ASC) AS rnk
         |  FROM cooc
         |)
         |SELECT vt.pid AS target_pid, vc.pid AS neighbor_pid,
         |       pt.p_name AS target_name, pc.p_name AS neighbor_name,
         |       t.cnt, t.rnk
         |FROM topk t
         |JOIN vocab vt ON t.target = vt.idx
         |JOIN vocab vc ON t.context = vc.idx
         |JOIN part pt ON vt.pid = pt.p_partkey
         |JOIN part pc ON vc.pid = pc.p_partkey
         |WHERE t.rnk <= $TopK
         |ORDER BY target_pid, rnk""".stripMargin,

    "q15_neighbor_report" ->
      s"""$pairsSqlCte,
         |cooc AS (
         |  SELECT target, context, count(*) AS cnt
         |  FROM pairs GROUP BY target, context
         |),
         |topk AS (
         |  SELECT target, context, cnt,
         |         row_number() OVER (PARTITION BY target
         |           ORDER BY cnt DESC, context ASC) AS rnk
         |  FROM cooc
         |)
         |SELECT vt.pid AS target_pid,
         |       string_agg(pc.p_name, '; ' ORDER BY t.rnk) AS neighbors
         |FROM topk t
         |JOIN vocab vt ON t.target = vt.idx
         |JOIN vocab vc ON t.context = vc.idx
         |JOIN part pc ON vc.pid = pc.p_partkey
         |WHERE t.rnk <= $TopK
         |GROUP BY vt.pid ORDER BY target_pid""".stripMargin,

    "q16_cosine_topk" ->
      s"""WITH c AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings
         |),
         |p AS (
         |  SELECT vec_id AS probe_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pv
         |  FROM embeddings WHERE vec_id < 5
         |),
         |s AS (
         |  SELECT probe_id, vec_id,
         |    round(
         |      list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * pv[i])) /
         |      (sqrt(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * v[i]))) *
         |       sqrt(list_sum(list_transform(range(1, len(pv) + 1), i -> pv[i] * pv[i])))),
         |      9) AS cos
         |  FROM c, p WHERE vec_id <> probe_id
         |)
         |SELECT probe_id, vec_id, cos,
         |       CAST(row_number() OVER (PARTITION BY probe_id
         |         ORDER BY cos DESC, vec_id ASC) AS BIGINT) AS rnk
         |FROM s
         |QUALIFY rnk <= $TopK
         |ORDER BY probe_id, rnk""".stripMargin
  )
}

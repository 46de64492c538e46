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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Top co-purchase neighbors per part (SURVEY.md §7.2) — placeholder
    * points at the pricing summary until Similarity lands. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

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
        |       count(DISTINCT l_orderkey) AS n_orders FROM lineitem""".stripMargin
  )
}

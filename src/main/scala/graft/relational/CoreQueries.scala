package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational surface (SURVEY.md §2): every operator family the
  * reference exercises — scans, filter/project (P1–P7), dedup (D1–D2),
  * joins inner/left-outer/compound-key (J1–J3), aggregation (A1–A4),
  * window (W1), top-k (O1), date/time + string functions (F1–F8), set ops.
  *
  * Every query here is paired with a DuckDB-runnable ANSI oracle and is
  * written to be deterministic: total-order sorts, doubles rounded at the
  * edge, ints widened to long (DuckDB returns BIGINT from most extractors).
  *
  * Scale notes are inline per query — each is shaped so the same plan holds
  * on a 1000-executor cluster: filters/projections reach the parquet scan,
  * small sides broadcast, aggregations are partial+final hash aggregates.
  */
object CoreQueries {

  /** TPC-H Q1 shape (README.md:111–147's agg-sort analytics, SURVEY §2.5).
    * Scan → partial hash agg (map-side combine) → 1 shuffle on the 2-col
    * group key (6 groups) → final agg → tiny sort. At 100 TB the shuffle
    * carries only num_partitions × 6 pre-aggregated rows.
    */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Filter + projection + alias + string functions (P1/P2/P4, F6, F8).
    * Both predicates and the 4-column projection push down to the parquet
    * scan (PushedFilters + pruned ReadSchema) — reads 4 of 6 columns.
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_size" >= 25 && $"p_retailprice" > 905.0)
      .select(
        $"p_partkey",
        upper($"p_name").as("p_name_up"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
        $"p_retailprice")
      .orderBy($"p_partkey")
  }

  /** TPC-H Q3 shape: selective dim filter → fact join → agg → top-k
    * (J2 + A1 + O1). BOTH joins are left to the planner (round 10 dropped
    * the explicit broadcast of the filtered customer segment: a segment is
    * a FIXED FRACTION of customers — ~1/5 — so the hinted side grows with
    * the corpus and an unconditional hint OOMs at 100 TB; the planner
    * broadcasts it at small scale from stats and AQE degrades it to a
    * shuffle join when it outgrows the threshold — the same size-based
    * decision the lineitem ⋈ (orders⋈cust) join has always relied on;
    * VERDICT r7 finding #1). ORDER BY on the *rounded* revenue + key is a
    * total order ⇒ deterministic LIMIT; orderBy+limit fuses to
    * TakeOrderedAndProject (no cluster-wide sort).
    */
  def q03JoinAggTopk(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    li.join(ord.join(cust, $"o_custkey" === $"c_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderkey")
      .agg(
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"o_orderkey")
      .limit(10)
  }

  /** Left-outer join with unmatched-null FKs + null-skipping COUNT(col)
    * (J1 shape = etl.py:175–179, A2 = README.md:257). The filter on the
    * right side is pushed below the join; count(l_orderkey) counts only
    * matched rows exactly like COUNT(s_title) in the reference's Q4.
    */
  def q04LeftJoinCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hi = Tables.lineitem(s, dir).filter($"l_quantity" > 45).select($"l_orderkey")
    Tables.orders(s, dir)
      .join(hi, $"o_orderkey" === $"l_orderkey", "left_outer")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_rows"), count($"l_orderkey").as("n_matched"))
      .orderBy($"o_orderstatus")
  }

  /** Compound-key left-outer join (J1/J3: two-column equi-join like
    * log.song=title AND log.artist=artist_name, etl.py:175–179; sp_user_id
    * AND sp_level, README.md:158–160). The dim is derived via groupBy then
    * thinned so some (lang, source) pairs miss ⇒ real null FK rows.
    */
  def q05CompoundKeyJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val dim = docs.groupBy($"lang", $"source")
      .agg(min($"doc_id").as("rep_id"))
      .filter($"rep_id" % 2 === 0)
      .select($"lang".as("d_lang"), $"source".as("d_source"), $"rep_id")
    docs.join(broadcast(dim),
        docs("lang") === dim("d_lang") && docs("source") === dim("d_source"),
        "left_outer")
      .select($"doc_id", $"rep_id")
      .orderBy($"doc_id")
  }

  /** dropDuplicates ≡ DISTINCT (D1/D2, etl.py:71/87/138). Planned as a
    * partial+final HashAggregate over the 3 columns — the shuffle carries
    * only distinct triples per map partition.
    */
  def q06Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_linestatus", $"l_linenumber".cast("long").as("l_linenumber"))
      .dropDuplicates()
      .orderBy($"l_returnflag", $"l_linestatus", $"l_linenumber")
  }

  /** row_number window (W1, etl.py:192–200) with a unique-key tiebreaker so
    * ids are run-stable (the reference's (start_time,user_id) order is not —
    * SURVEY §4). One shuffle on the partition key, then in-partition sort.
    */
  def q07WindowRownum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", row_number().over(w).cast("long").as("rn"))
      .filter($"rn" <= 3)
      .orderBy($"o_custkey", $"rn")
  }

  /** Global MAX + scalar-subquery filter (A3/A4, README.md:209–219).
    * DataFrame form of Catalyst's subquery rewrite: the 1-row global max is
    * broadcast-cross-joined, never collected to the driver.
    */
  def q08ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cnt = Tables.orders(s, dir).groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    val mx = cnt.agg(max($"n_orders").as("max_n"))
    cnt.join(broadcast(mx), $"n_orders" === $"max_n")
      .select($"o_custkey", $"n_orders")
      .orderBy($"o_custkey")
  }

  /** Date/time extraction + formatted rendering (F1–F7, etl.py:144–163,
    * README.md:251–256). Covers the reference's `time` dim columns; weekday
    * is the *intended* capability (dayofweek), not the buggy 'F' pattern
    * (etl.py:163 — documented divergence, SURVEY §7). All ints widened to
    * long to match DuckDB's BIGINT extractors.
    */
  def q09TimeDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss").as("date_str"),
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dom"),
        hour($"o_orderdate").cast("long").as("hr"),
        weekofyear($"o_orderdate").cast("long").as("wk"),
        dayofweek($"o_orderdate").cast("long").as("wd"))
      .orderBy($"o_orderkey")
  }

  /** Set operations (SURVEY §2.8 — absent in the reference, present in the
    * engine): INTERSECT / EXCEPT / UNION-distinct, each reduced to a count
    * so the result is a stable 3-row summary.
    */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ck = Tables.customer(s, dir).select($"c_custkey".as("k"))
    val ok = Tables.orders(s, dir).select($"o_custkey".as("k"))
    def tag(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("tag"), $"n")
    tag("all_keys", ck.union(ok).distinct())
      .union(tag("both", ck.intersect(ok)))
      .union(tag("cust_no_order", ck.except(ok)))
      .orderBy($"tag")
  }

  /** INNER compound-key join (J3 literal: the README.md:158–160
    * `sp_user_id = u_user_id AND sp_level = u_level` shape — q05 is the
    * left-outer variant). Dim derived, thinned, broadcast.
    */
  def q22InnerCompoundJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val dim = docs.groupBy($"lang", $"source")
      .agg(min($"doc_id").as("rep_id"))
      .filter($"rep_id" % 2 === 0)
      .select($"lang".as("d_lang"), $"source".as("d_source"), $"rep_id")
    docs.join(broadcast(dim),
        docs("lang") === dim("d_lang") && docs("source") === dim("d_source"), "inner")
      .groupBy($"rep_id")
      .agg(count(lit(1)).as("n_docs"), countDistinct($"doc_id").as("n_unique"))
      .orderBy($"rep_id")
  }

  /** The reference's dimension-cleaning idiom (P1+P3, etl.py:68–71,
    * 131–137): null-drop on a key subset plus the empty-string key filter.
    * Nulls/empties are manufactured deterministically from doc_id since the
    * testdata key columns are dense — the operators under test are
    * `na.drop("any", subset)` and `=!= ""` exactly as the reference chains
    * them.
    */
  def q25NaDrop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("k",
        when($"doc_id" % 7 === 0, lit(null).cast("string"))
          .when($"doc_id" % 11 === 0, lit(""))
          .otherwise($"source"))
      .na.drop("any", Seq("k"))
      .filter($"k" =!= "")
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), countDistinct($"lang").as("n_langs"))
      .orderBy($"k")
  }

  /** FULL OUTER join — the one join type the rest of the menu lacks
    * (inner q03/q22, left-outer q04/q05, semi/anti q32, as-of q33, range
    * q51). Negative-balance customers FULL OUTER per-customer counts of
    * big-ticket orders: all three sides (both / cust_only / order_only)
    * are non-empty at every test scale, so both null-propagation
    * directions are actually exercised. The shuffle carries the
    * aggregated order counts, not order rows.
    */
  def q65FullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir).filter($"c_acctbal" < 0)
      .select($"c_custkey", $"c_mktsegment")
    val o = Tables.orders(s, dir).filter($"o_totalprice" > 450000)
      .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
      .select(
        when($"c_custkey".isNull, "order_only")
          .when($"o_custkey".isNull, "cust_only")
          .otherwise("both").as("side"),
        coalesce($"n_orders", lit(0L)).as("n_orders"))
      .groupBy($"side")
      .agg(count(lit(1)).as("n"), sum($"n_orders").as("total_orders"))
      .orderBy($"side")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_full_outer_join" -> (q65FullOuterJoin _),
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_agg_topk" -> (q03JoinAggTopk _),
    "q04_left_join_counts" -> (q04LeftJoinCounts _),
    "q05_compound_key_join" -> (q05CompoundKeyJoin _),
    "q06_distinct" -> (q06Distinct _),
    "q07_window_rownum" -> (q07WindowRownum _),
    "q08_scalar_subquery" -> (q08ScalarSubquery _),
    "q09_time_dims" -> (q09TimeDims _),
    "q10_setops" -> (q10SetOps _),
    "q22_inner_compound_join" -> (q22InnerCompoundJoin _),
    "q25_na_drop" -> (q25NaDrop _),
  )

  val oracles: Map[String, String] = Map(
    "q65_full_outer_join" ->
      """WITH c AS (
        |  SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal < 0
        |), o AS (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  WHERE o_totalprice > 450000 GROUP BY o_custkey
        |), j AS (
        |  SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
        |              WHEN o.o_custkey IS NULL THEN 'cust_only'
        |              ELSE 'both' END AS side,
        |         coalesce(o.n_orders, 0) AS n_orders
        |  FROM c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |)
        |SELECT side, count(*) AS n, CAST(sum(n_orders) AS BIGINT) AS total_orders
        |FROM j GROUP BY side ORDER BY side""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT p_partkey, upper(p_name) AS p_name_up,
        | concat(p_brand, ':', p_type) AS brand_type, p_retailprice
        |FROM part WHERE p_size >= 25 AND p_retailprice > 905.0
        |ORDER BY p_partkey""".stripMargin,
    "q03_join_agg_topk" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n_items
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q04_left_join_counts" ->
      """SELECT o_orderstatus, count(*) AS n_rows, count(l_orderkey) AS n_matched
        |FROM orders LEFT JOIN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) l
        | ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q05_compound_key_join" ->
      """WITH dim AS (
        |  SELECT lang, source, min(doc_id) AS rep_id FROM documents GROUP BY lang, source
        |), dim2 AS (SELECT * FROM dim WHERE rep_id % 2 = 0)
        |SELECT d.doc_id, dim2.rep_id
        |FROM documents d LEFT JOIN dim2 ON d.lang = dim2.lang AND d.source = dim2.source
        |ORDER BY d.doc_id""".stripMargin,
    "q06_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_linenumber AS BIGINT) AS l_linenumber
        |FROM lineitem ORDER BY l_returnflag, l_linestatus, l_linenumber""".stripMargin,
    "q07_window_rownum" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q08_scalar_subquery" ->
      """WITH cnt AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n_orders FROM cnt
        |WHERE n_orders = (SELECT max(n_orders) FROM cnt)
        |ORDER BY o_custkey""".stripMargin,
    "q09_time_dims" ->
      """SELECT o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_str,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom, hour(o_orderdate) AS hr,
        | week(o_orderdate) AS wk, dayofweek(o_orderdate) + 1 AS wd
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q22_inner_compound_join" ->
      """WITH dim AS (
        |  SELECT lang, source, min(doc_id) AS rep_id FROM documents GROUP BY lang, source
        |), dim2 AS (SELECT * FROM dim WHERE rep_id % 2 = 0)
        |SELECT rep_id, count(*) AS n_docs, count(DISTINCT d.doc_id) AS n_unique
        |FROM documents d JOIN dim2 ON d.lang = dim2.lang AND d.source = dim2.source
        |GROUP BY rep_id ORDER BY rep_id""".stripMargin,
    "q25_na_drop" ->
      """WITH x AS (
        |  SELECT CASE WHEN doc_id % 7 = 0 THEN NULL
        |              WHEN doc_id % 11 = 0 THEN ''
        |              ELSE source END AS k, lang
        |  FROM documents
        |)
        |SELECT k, count(*) AS n, count(DISTINCT lang) AS n_langs
        |FROM x WHERE k IS NOT NULL AND k != '' GROUP BY k ORDER BY k""".stripMargin,
    "q10_setops" ->
      """SELECT tag, n FROM (
        | SELECT 'all_keys' AS tag, count(*) AS n FROM
        |   (SELECT c_custkey FROM customer UNION SELECT o_custkey FROM orders)
        | UNION ALL SELECT 'both', count(*) FROM
        |   (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
        | UNION ALL SELECT 'cust_no_order', count(*) FROM
        |   (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
        |) ORDER BY tag""".stripMargin,
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import QueryUtil._

/** Relational operator coverage over the driver's TPC-H-ish tables —
  * the Spark-first mapping of the reference's dataflow primitives
  * (SURVEY.md §2.2 predicates, §2.3 joins, §2.4 aggregations, §2.5
  * order/top-k, §2.6 set ops, §2.7 scalar functions). Each query is
  * declarative DataFrame API so Catalyst gets pushdown/pruning/codegen;
  * explicit `broadcast()` on dimension sides keeps the big-fact joins
  * shuffle-free where a 100 TB fact table would otherwise shuffle.
  */
object Relational {

  type Q = (String, (SparkSession, String) => DataFrame, Option[String])

  val defs: Seq[Q] = Seq(

    // ---- Aggregation roll-up (A1/A4 analog; TPC-H Q1 shape). Partial
    // aggregation is map-side; one shuffle on the 2-key group.
    ("q01_pricing_summary",
      (s, d) => tbl(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity),2) AS sum_qty,
             round(sum(l_extendedprice),2) AS sum_base,
             round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             round(avg(l_quantity),4) AS avg_qty,
             CAST(count(*) AS BIGINT) AS cnt
             FROM lineitem GROUP BY 1,2 ORDER BY 1,2""")),

    // ---- Filter + projection with parquet pushdown (P2; scan reads
    // only 3 columns, predicates reach PushedFilters).
    ("q02_filter_range",
      (s, d) => tbl(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
               col("l_quantity") < 25)
        .agg(count(lit(1)).as("cnt"),
             round(sum("l_extendedprice"), 2).as("sum_price")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS cnt,
             round(sum(l_extendedprice),2) AS sum_price
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
               AND l_quantity < 25""")),

    // ---- Broadcast hash join fact ⋈ small dim (J3 pattern): customer
    // broadcasts, orders never shuffles.
    ("q03_broadcast_join",
      (s, d) => tbl(s, d, "orders")
        .join(broadcast(tbl(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             round(sum(o_totalprice),2) AS revenue
             FROM orders JOIN customer ON o_custkey = c_custkey
             GROUP BY 1 ORDER BY 1""")),

    // ---- Multi-way join through the dimension snowflake; all dims
    // broadcast so the only shuffle is the final group-by.
    ("q04_join_snowflake",
      (s, d) => tbl(s, d, "orders")
        .join(broadcast(tbl(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(tbl(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("r_name", "n_name"),
      Some("""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
             round(sum(o_totalprice),2) AS revenue
             FROM orders JOIN customer ON o_custkey = c_custkey
             JOIN nation ON c_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY 1,2 ORDER BY 1,2""")),

    // ---- Left-semi join (J1 page-list membership analog).
    ("q05_semi_join",
      (s, d) => tbl(s, d, "supplier")
        .join(tbl(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey"),
      Some("""SELECT s_suppkey, s_name FROM supplier
             WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
             ORDER BY s_suppkey""")),

    // ---- Left-anti join — the checkpoint-resume primitive (SURVEY.md
    // §2.9 I5: source ANTI JOIN completed-partitions).
    ("q06_anti_join",
      (s, d) => tbl(s, d, "customer")
        .join(tbl(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             ORDER BY c_custkey""")),

    // ---- Window top-k per group (W-class order semantics).
    ("q07_window_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        tbl(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast("long"))
          .where(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, rn FROM (
             SELECT o_custkey, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---- Running-total window (prefix accumulation → identical FP
    // sequence in both engines; rounded anyway).
    ("q08_window_running",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, d, "orders")
          .withColumn("running", round(sum("o_totalprice").over(w), 2))
          .select("o_custkey", "o_orderkey", "running")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running
             FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- Global top-k (TakeOrderedAndProject — no full sort at scale).
    ("q09_topk_orders",
      (s, d) => tbl(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---- Distinct (hash aggregate, partial+final).
    ("q10_distinct_status",
      (s, d) => tbl(s, d, "orders")
        .select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             ORDER BY 1,2""")),

    // ---- Set op: distinct union of two key domains (§2.6).
    ("q11_union_nations",
      (s, d) => tbl(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(tbl(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
             UNION SELECT s_nationkey FROM supplier ORDER BY nk""")),

    // ---- CASE-WHEN classification chain (P3 page-categorization shape).
    ("q12_price_bands",
      (s, d) => tbl(s, d, "orders")
        .withColumn("band",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
        .orderBy("band"),
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                         WHEN o_totalprice < 150000 THEN 'mid'
                         ELSE 'high' END AS band,
             CAST(count(*) AS BIGINT) AS n, round(avg(o_totalprice),2) AS avg_price
             FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- Scalar string functions (F1-F6 marker/label shapes).
    ("q13_string_funcs",
      (s, d) => tbl(s, d, "part")
        .select(
          col("p_partkey"),
          upper(substring(col("p_name"), 1, 8)).as("pfx"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(substr(p_name,1,8)) AS pfx,
             p_brand || '|' || p_type AS brand_type,
             CAST(length(p_name) AS INT) AS name_len
             FROM part ORDER BY p_partkey""")),

    // ---- Time bucketing (F17 / date handling; tumbling-window analog
    // of a streaming agg, run in batch).
    ("q14_hourly_events",
      (s, d) => tbl(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour"),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(count(*) AS BIGINT) AS n, round(sum(value),2) AS sum_value
             FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- Semi-structured extraction from a JSON-ish string column
    // (F11 safe-parse surface; regexp on both engines).
    ("q15_json_extract",
      (s, d) => tbl(s, d, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- Ordered array collection (A2/W2: collect + array_sort; DuckDB
    // string_agg ORDER BY is the oracle).
    ("q16_sorted_collect",
      (s, d) => tbl(s, d, "supplier")
        .join(broadcast(tbl(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_nationkey", "n_name")
        .agg(concat_ws(",", array_sort(collect_list("s_name"))).as("suppliers"),
             count(lit(1)).as("n_suppliers"))
        .orderBy("n_nationkey"),
      Some("""SELECT n_nationkey, n_name,
             string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
             CAST(count(*) AS BIGINT) AS n_suppliers
             FROM supplier JOIN nation ON s_nationkey = n_nationkey
             GROUP BY 1,2 ORDER BY 1""")),

    // ---- ROLLUP grouping sets (run-level metric roll-ups, A9 shape).
    ("q17_rollup",
      (s, d) => tbl(s, d, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT o_orderpriority, o_orderstatus,
             CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice),2) AS revenue
             FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
             ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""")),

    // ---- As-of join, composed from built-ins (preference (a) for an
    // operator Spark lacks): for each purchase, the most recent prior
    // view by the same user. Union the tagged streams, order by
    // (ts, side) so a view at the exact purchase timestamp counts as
    // prior, and carry the last view ts forward with an ignore-nulls
    // window — one shuffle on user_id, no range join explosion. Oracle
    // uses the engine-native ASOF LEFT JOIN.
    ("q37_asof_join",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = tbl(s, d, "events")
        val views = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), lit(0).as("side"), lit(null).cast("long").as("event_id"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("side").asc, col("event_id").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        views.union(purchases)
          .withColumn("last_view",
            last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
          .where(col("side") === 1)
          .select(col("event_id"), col("user_id"),
            date_format(col("last_view").cast("timestamp"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_view_ts"))
          .orderBy("event_id")
      },
      Some("""WITH purchases AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
             views AS (SELECT user_id, ts AS vts FROM events WHERE event_type = 'view')
             SELECT p.event_id, p.user_id,
               strftime(v.vts, '%Y-%m-%d %H:%M:%S.%f') AS last_view_ts
             FROM purchases p ASOF LEFT JOIN views v
               ON p.user_id = v.user_id AND v.vts <= p.ts
             ORDER BY p.event_id""")),

    // ---- Range (interval) join via bucketize-to-equi-join: views
    // within ±60s of each purchase. A naive |Δt|≤ε condition is a
    // nested-loop cross product; bucketing both sides to ε-grains and
    // equi-joining on bucket∈{b-1,b,b+1} (one side replicated 3×) makes
    // it a hash join whose per-bucket cardinality is bounded by event
    // density — the pattern that survives 10^12 rows. Exact predicate
    // re-checked after the join.
    ("q38_range_join",
      (s, d) => {
        val eps = 60000000L // 60s in µs
        val ev = tbl(s, d, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("us"), floor(col("us") / eps).as("bucket"))
        val v = ev.where(col("event_type") === "view")
          .select(col("us").as("vus"),
            explode(array(floor(col("us") / eps) - 1, floor(col("us") / eps),
              floor(col("us") / eps) + 1)).as("bucket"))
        p.join(v, Seq("bucket"))
          .where(abs(col("us") - col("vus")) <= eps)
          .groupBy("event_id")
          .agg(count(lit(1)).as("n_nearby_views"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (SELECT event_id, epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'),
             v AS (SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'view')
             SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_nearby_views
             FROM p JOIN v ON abs(p.us - v.us) <= 60000000
             GROUP BY 1 ORDER BY 1""")),

    // ---- Scalar subquery via the SQL surface (spark.sql): Catalyst
    // plans the uncorrelated aggregate once and broadcasts the scalar.
    ("q36_scalar_subquery",
      (s, d) => {
        tbl(s, d, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderpriority, count(*) AS n,
                round(min(o_totalprice),2) AS min_price
                FROM orders_v
                WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v) * 1.5
                GROUP BY 1 ORDER BY 1""")
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             round(min(o_totalprice),2) AS min_price
             FROM orders
             WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
             GROUP BY 1 ORDER BY 1""")),

    // ---- Sessionization: gap-based event sessions per user (lag +
    // running-sum window — the batch form of a session window; the
    // streaming twin would be mapGroupsWithState). Gap compare runs on
    // integral microseconds so both engines agree at the boundary.
    ("q34_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val g = tbl(s, d, "events")
          .withColumn("us", unix_micros(col("ts").cast("timestamp")))
          .withColumn("prev", lag("us", 1).over(w))
          .withColumn("new_s",
            when(col("prev").isNull || col("us") - col("prev") > 21600000000L, 1).otherwise(0))
          .withColumn("session_id", sum("new_s").over(run))
        g.groupBy("user_id", "session_id").agg(count(lit(1)).as("len"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_sessions"),
               sum("len").as("n_events"),
               max("len").as("max_session_len"))
          .orderBy("user_id")
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             FROM events),
             f AS (SELECT user_id, event_id, ts,
               CASE WHEN prev IS NULL OR us - prev > 21600000000 THEN 1 ELSE 0 END AS new_s
             FROM g),
             sess AS (SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             FROM f),
             per AS (SELECT user_id, session_id, count(*) AS len
               FROM sess GROUP BY 1,2)
             SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(len) AS BIGINT) AS n_events,
               CAST(max(len) AS BIGINT) AS max_session_len
             FROM per GROUP BY 1 ORDER BY 1""")),

    // ---- Exact distinct count per group (A7 distinct-backends shape).
    ("q18_count_distinct",
      (s, d) => tbl(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             CAST(count(*) AS BIGINT) AS n_orders
             FROM orders GROUP BY 1 ORDER BY 1""")),

    // ---- Salt-replicate skew join: enrich each crawl row with its
    // host's aggregate stats when one host dominates the key
    // distribution (planted: host 0 carries ~52% of docs — the
    // crawl-reality Zipf head). The classic manual skew recipe for a
    // shuffled large⋈large join: the probe side adds
    // salt = hash(row) mod S, the build side replicates each key S×
    // (explode), and the join key becomes (host, salt) so the hot
    // host's rows spread over S reducers instead of one straggler
    // task. Complements q47 (salted AGGREGATION) and AQE's runtime
    // skew split (which only fires on sort-merge joins above
    // per-partition thresholds; the manual salt also covers
    // shuffled-hash and pre-AQE static plans). Oracle = the plain
    // unsalted join, proving salting is semantics-preserving.
    ("q79_salted_skew_join",
      (s, d) => {
        val S = 8
        val docs = tbl(s, d, "documents")
          .select(col("doc_id"), col("n_chars"),
            when(col("doc_id") % 2 === 0, lit(0L))
              .otherwise(col("doc_id") % 25).as("host_id"))
        val stats = docs.groupBy("host_id")
          .agg(count(lit(1)).as("host_docs"), sum("n_chars").as("host_chars"))
        val statsSalted = stats
          .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
        val salted = docs
          .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(S.toLong)).cast("int"))
        // Pin the sort-merge shape the technique targets: in the real
        // scenario both sides are crawl-scale, so broadcast is off the
        // table — without the hint, Catalyst (correctly) broadcasts one
        // side at sandbox row counts and the demonstrated plan would
        // not be the one that needs salting.
        salted.join(statsSalted.hint("merge"), Seq("host_id", "salt"))
          .select(col("doc_id"), col("host_id"), col("host_docs"), col("host_chars"))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
               CASE WHEN doc_id % 2 = 0 THEN 0 ELSE doc_id % 25 END AS host_id
             FROM documents),
             st AS (SELECT host_id, count(*) AS host_docs,
               sum(n_chars) AS host_chars FROM d GROUP BY 1)
             SELECT d.doc_id, CAST(d.host_id AS BIGINT) AS host_id,
               CAST(st.host_docs AS BIGINT) AS host_docs,
               CAST(st.host_chars AS BIGINT) AS host_chars
             FROM d JOIN st USING (host_id) ORDER BY doc_id"""))
  )
}

package graft.queries

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.{oracle, rowsOnly}
import graft.functions.Scalars._
import graft.sources.Tables

/** Relational core: every SQL-expressible operator family from SURVEY.md §2
  * (filters F, joins J, aggregations A, windows W/T/O, set ops U,
  * scalar surface §2.7, incrementality §2.8) restated over the driver
  * tables, each with a DuckDB oracle.
  *
  * Scale notes apply to every query here: filters/projections are expressed
  * on columns (parquet pushdown + pruning), small dimensions are broadcast
  * explicitly, aggregations are partial-agg friendly (no distinct-heavy
  * shapes), and windows partition on high-cardinality keys so no single
  * partition explodes at 100 TB.
  */
object CoreQueries {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables(s, d, n)

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // A-family: grouped aggregation (A1..A9 analog; TPC-H Q1 shape).
    // Partial aggregation (map-side combine) + 2-key groupBy: shuffles only
    // the tiny per-group state, never the 100 TB scan.
    oracle(
      "q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSumSql("l_quantity")} AS sum_qty,
         |  ${decSumSql("l_extendedprice")} AS sum_base_price,
         |  ${decSumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${decAvgSql("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""",
      "SURVEY §2.4: grouped agg with exact money sums") { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit(LocalDateTime.parse("1999-12-31T00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice")).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          decAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // F1: the dao-candidate predicate in its faithful ARRAY form
    // (bin/main.py:133-140): a did qualifies when SOME dao is a
    // harvestable pdf (not under /Accessions/, not show="none") and NO
    // sibling dao is an already-inserted METS dao (the main.py:138
    // sibling walk). Each order fabricates a two-dao did from its own
    // columns so every leg of the predicate is exercised; the filter is
    // EadXml.daoCandidatesNested itself — the operator the harvest
    // pipeline runs (round-3 verdict item 2: role exclusion re-pointed
    // at the array form).
    oracle(
      "q02_compound_filter",
      """WITH base AS (
        |  SELECT *, [
        |    struct_pack(
        |      href := (CASE WHEN o_totalprice > 5000.0 THEN '/f/'
        |               ELSE '/Accessions/' END) || o_orderkey || '.pdf',
        |      "show" := CASE WHEN o_orderstatus = 'P' THEN 'none' END,
        |      role := CAST(NULL AS VARCHAR)),
        |    struct_pack(
        |      href := '/m/' || o_orderkey || '.xml',
        |      "show" := CAST(NULL AS VARCHAR),
        |      role := CASE WHEN contains(o_orderpriority, 'URGENT')
        |              THEN 'http://www.loc.gov/METS/' END)
        |  ] AS daos FROM orders)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice
        |FROM base
        |WHERE len(list_filter(daos, d ->
        |        contains(d.href, '.pdf') AND NOT contains(d.href, '/Accessions/')
        |        AND (d."show" IS NULL OR d."show" <> 'none'))) > 0
        |  AND len(list_filter(daos, d ->
        |        d.role IS NOT NULL AND d.role = 'http://www.loc.gov/METS/')) = 0
        |ORDER BY o_orderkey""",
      "SURVEY §2.2 F1: dao-array candidate predicate (pdf + no METS sibling)") { (s, d) =>
      val withDaos = t(s, d, "orders").withColumn("daos", array(
        struct(
          concat(
            when(col("o_totalprice") > 5000.0, lit("/f/")).otherwise(lit("/Accessions/")),
            col("o_orderkey"), lit(".pdf")).as("href"),
          when(col("o_orderstatus") === "P", lit("none"))
            .otherwise(lit(null).cast("string")).as("show"),
          lit(null).cast("string").as("role")),
        struct(
          concat(lit("/m/"), col("o_orderkey"), lit(".xml")).as("href"),
          lit(null).cast("string").as("show"),
          when(col("o_orderpriority").contains("URGENT"),
            lit(graft.sources.EadXml.MetsRole))
            .otherwise(lit(null).cast("string")).as("role"))))
      graft.sources.EadXml.daoCandidatesNested(withDaos)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // F3: status dispatch (401/404/200 CASE, bin/main.py:495-538).
    oracle(
      "q03_status_dispatch",
      s"""SELECT CASE WHEN event_type = 'error' THEN 'dead_letter'
         |            WHEN event_type = 'signup' THEN 'welcome'
         |            ELSE 'ok' END AS disposition,
         |  COUNT(*) AS n,
         |  ${decSumSql("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY 1""",
      "SURVEY §2.2 F3: when/otherwise status dispatch + dead-letter rollup") { (s, d) =>
      t(s, d, "events")
        .withColumn("disposition",
          when(col("event_type") === "error", "dead_letter")
            .when(col("event_type") === "signup", "welcome")
            .otherwise("ok"))
        .groupBy("disposition")
        .agg(count(lit(1)).as("n"), decSum(col("value")).as("total_value"))
        .orderBy("disposition")
    },

    // J1 + F12/F14: broadcast dimension join + title concat + ws-normalize
    // (bin/main.py:149-157). customer/nation are small dims → broadcast;
    // the fact side never shuffles.
    oracle(
      "q04_title_join",
      s"""SELECT o_orderkey,
         |  ${normWsSql("concat_ws(', ', c_name, n_name)")} AS title
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY o_orderkey""",
      "SURVEY §2.3 J1: broadcast title-lookup join") { (s, d) =>
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = t(s, d, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(col("o_orderkey"),
          normWs(concat_ws(", ", col("c_name"), col("n_name"))).as("title"))
        .orderBy("o_orderkey")
    },

    // F8: existence semi-join (publish-mets-only.rb:65).
    oracle(
      "q05_semi_join",
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""",
      "SURVEY §2.2 F8: left-semi existence join") { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },

    // F7: idempotence anti-join — "skip work whose output exists"
    // (bin/main.py:184,232,282,368; ~20 sites).
    oracle(
      "q06_anti_join",
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey
        |                    AND l_shipdate < TIMESTAMP '1995-06-01 00:00:00')
        |ORDER BY p_partkey""",
      "SURVEY §2.2 F7: left-anti skip-if-exists join") { (s, d) =>
      val p = t(s, d, "part")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit(LocalDateTime.parse("1995-06-01T00:00:00")))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    },

    // J2 + F3: writeback join — results joined to source rows with
    // conditional projection (bin/main.py:490-532).
    oracle(
      "q07_writeback_join",
      s"""SELECT o_orderkey, COALESCE(n_lines, 0) AS n_lines,
         |  CASE WHEN n_lines IS NULL THEN 'missing'
         |       WHEN revenue > 300000.0 THEN 'large'
         |       ELSE 'ok' END AS disposition
         |FROM orders LEFT JOIN (
         |  SELECT l_orderkey, COUNT(*) AS n_lines,
         |    ${decSumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |  FROM lineitem GROUP BY 1) agg ON o_orderkey = l_orderkey
         |ORDER BY o_orderkey""",
      "SURVEY §2.3 J2: left writeback join + status dispatch") { (s, d) =>
      val o = t(s, d, "orders")
      val agg = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      o.join(agg, o("o_orderkey") === agg("l_orderkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("n_lines"), lit(0L)).as("n_lines"),
          when(col("n_lines").isNull, "missing")
            .when(col("revenue") > 300000.0, "large")
            .otherwise("ok").as("disposition"))
        .orderBy("o_orderkey")
    },

    // J4: n-way stem join with coalesce (bin/dao.py:160-178).
    oracle(
      "q08_full_outer_stems",
      """SELECT COALESCE(a.key, b.key) AS key,
        |  COALESCE(n_orders, 0) AS n_orders, c_acctbal
        |FROM (SELECT o_custkey AS key, COUNT(*) AS n_orders
        |      FROM orders GROUP BY 1) a
        |FULL OUTER JOIN (SELECT c_custkey AS key, c_acctbal FROM customer) b
        |  ON a.key = b.key
        |ORDER BY key""",
      "SURVEY §2.3 J4: full-outer multi-source stem join") { (s, d) =>
      val a = t(s, d, "orders")
        .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_orders"))
      val b = t(s, d, "customer")
        .select(col("c_custkey").as("key"), col("c_acctbal"))
      a.join(b, Seq("key"), "full_outer")
        .select(col("key"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("c_acctbal"))
        .orderBy("key")
    },

    // A1/A9/O2: group-to-document with deterministic intra-group order
    // (bin/dao.py:173-203; pdftk concat bin/dirtopdf.sh:117-123).
    // Members are rendered to strings first and sorted lexicographically:
    // (l_orderkey, l_linenumber) is NOT unique in this data, so sorting by
    // the rendered member is the only cross-engine-total order (equal
    // members are interchangeable).
    oracle(
      "q09_group_doc_flat",
      """SELECT l_orderkey, string_agg(m, ',' ORDER BY m) AS doc FROM (
        |  SELECT l_orderkey,
        |    l_linenumber::VARCHAR || ':' || CAST(floor(l_quantity) AS BIGINT)::VARCHAR AS m
        |  FROM lineitem)
        |GROUP BY 1 ORDER BY 1""",
      "SURVEY §2.4 A1: grouped document, sorted members") { (s, d) =>
      t(s, d, "lineitem")
        // range (not hash) partitioning BEFORE the group (round 14, the
        // committed q42/q43 shape): the aggregate's ClusteredDistribution
        // and the trailing total order are BOTH satisfied by the one
        // range exchange, so the rendered docs never cross the wire a
        // second time — 2 exchanges → 1. A/B steady 1.53 → 0.96 s.
        .repartitionByRange(col("l_orderkey"))
        .select(col("l_orderkey"),
          concat_ws(":", col("l_linenumber"), floor(col("l_quantity")).cast("long")).as("m"))
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_list(col("m"))), ",").as("doc"))
        .orderBy("l_orderkey")
    },

    // W1 + F19: per-group sequence numbering + zero-padded page names
    // (bin/main.py:268-281).
    // Window order must be TOTAL for cross-engine determinism:
    // (l_linenumber, l_partkey, l_suppkey) is unique within an order.
    oracle(
      "q10_seq_number",
      s"""SELECT l_orderkey, l_linenumber, seq, ${pageNameSql("seq")} AS page
         |FROM (SELECT l_orderkey, l_linenumber,
         |        ROW_NUMBER() OVER (PARTITION BY l_orderkey
         |          ORDER BY l_linenumber, l_partkey, l_suppkey) AS seq
         |      FROM lineitem)
         |ORDER BY l_orderkey, seq""",
      "SURVEY §2.5 W1: row_number page renumbering") { (s, d) =>
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
      t(s, d, "lineitem")
        // ONE range exchange serves the window's ClusteredDistribution
        // AND the trailing total order (RangePartitioning(k) prefix-
        // satisfies OrderedDistribution(k, seq)) — 2 exchanges → 1, and
        // the final sort is local. A/B steady 0.99 → 0.70 s.
        .repartitionByRange(col("l_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("seq"))
        .withColumn("page", pageName(col("seq")))
        .orderBy("l_orderkey", "seq")
    },

    // A3 + W2: count-offset renumbering (bin/pulfarize.rb:59-77).
    oracle(
      "q11_offset_seq",
      """WITH off AS (SELECT l_suppkey AS sk, COUNT(*) AS n_existing
        |             FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1)
        |SELECT l_suppkey, l_orderkey, l_linenumber,
        |  ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |                     ORDER BY l_orderkey, l_linenumber, l_partkey)
        |    + COALESCE(n_existing, 0) AS seq
        |FROM lineitem LEFT JOIN off ON l_suppkey = sk
        |WHERE l_linestatus = 'O'
        |ORDER BY l_suppkey, seq""",
      "SURVEY §2.5 W2: numbering continued after existing count") { (s, d) =>
      val li = t(s, d, "lineitem")
      // the q10 range-exchange shape: partition the big side by range on
      // the window key BEFORE the (broadcast) offset join — the window's
      // clustering and the trailing (l_suppkey, seq) order both ride the
      // one exchange. 2 big-side exchanges → 1.
      val base = li.filter(col("l_linestatus") === "O")
        .repartitionByRange(col("l_suppkey"))
      val off = li.filter(col("l_linestatus") === "F")
        .groupBy(col("l_suppkey").as("sk")).agg(count(lit(1)).as("n_existing"))
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey")
      base.join(off, base("l_suppkey") === off("sk"), "left")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (row_number().over(w).cast("long")
            + coalesce(col("n_existing"), lit(0L))).as("seq"))
        .orderBy("l_suppkey", "seq")
    },

    // A2/W3: 0-based index among siblings (pdf_idx, bin/main.py:160-165).
    oracle(
      "q12_sibling_idx",
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_orderdate, o_orderkey) - 1 AS pdf_idx
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""",
      "SURVEY §2.5 W3: preceding-sibling count as row_number()-1") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders")
        // q10's shape: one range exchange for window + trailing order
        .repartitionByRange(col("o_custkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          (row_number().over(w).cast("long") - 1).as("pdf_idx"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // T1: bottom-k prune (orientation vote stage 1, bin/orient_image.sh:62-65).
    oracle(
      "q13_bottom2_per_group",
      """SELECT user_id, event_id, value, rnk FROM (
        |  SELECT user_id, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rnk
        |  FROM events) WHERE rnk <= 2
        |ORDER BY user_id, rnk""",
      "SURVEY §2.5 T1: per-group bottom-2 (WindowGroupLimit-able)") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("value").asc, col("event_id").asc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          row_number().over(w).cast("long").as("rnk"))
        .filter(col("rnk") <= 2)
        .orderBy("user_id", "rnk")
    },

    // T2 (+A4/A5 shape): the full orientation vote — bottom-2 by a cheap
    // score, then argmin by a costlier score (bin/orient_image.sh:30-80).
    oracle(
      "q14_argmin_vote",
      """WITH s1 AS (
        |  SELECT user_id, event_id,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS kval,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rnk
        |  FROM events),
        |s2 AS (
        |  SELECT user_id, event_id, kval,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY kval, event_id) AS rnk2
        |  FROM s1 WHERE rnk <= 2)
        |SELECT user_id, event_id AS winner_event_id, kval
        |FROM s2 WHERE rnk2 = 1 ORDER BY user_id""",
      "SURVEY §2.5 T2: two-stage top-k → argmin vote (flagship analytic)") { (s, d) =>
      val ev = t(s, d, "events")
        .withColumn("kval", get_json_object(col("props"), "$.k").cast("long"))
      val w1 = Window.partitionBy("user_id").orderBy(col("value").asc, col("event_id").asc)
      val w2 = Window.partitionBy("user_id").orderBy(col("kval").asc, col("event_id").asc)
      ev.withColumn("rnk", row_number().over(w1))
        .filter(col("rnk") <= 2)
        .withColumn("rnk2", row_number().over(w2))
        .filter(col("rnk2") === 1)
        .select(col("user_id"), col("event_id").as("winner_event_id"), col("kval"))
        .orderBy("user_id")
    },

    // U1: multi-input union (bin/dao.py:148,160-167).
    oracle(
      "q15_union_inputs",
      """SELECT user_id, kind, COUNT(*) AS n FROM (
        |  SELECT user_id, 'signup' AS kind FROM events WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT user_id, 'purchase' AS kind FROM events WHERE event_type = 'purchase')
        |GROUP BY 1, 2 ORDER BY 1, 2""",
      "SURVEY §2.6 U1: unionByName of per-source scans") { (s, d) =>
      val ev = t(s, d, "events")
      val a = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), lit("signup").as("kind"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), lit("purchase").as("kind"))
      a.unionByName(b)
        .groupBy("user_id", "kind").agg(count(lit(1)).as("n"))
        .orderBy("user_id", "kind")
    },

    // Set ops beyond the reference (SURVEY §2.6: engine inherits these).
    oracle(
      "q16_intersect",
      """SELECT p_brand, p_size FROM part WHERE p_type = 'PROMO'
        |INTERSECT
        |SELECT p_brand, p_size FROM part WHERE p_retailprice > 950.0
        |ORDER BY p_brand, p_size""",
      "SURVEY §2.6: INTERSECT (distinct) for re-run diffing") { (s, d) =>
      val p = t(s, d, "part")
      p.filter(col("p_type") === "PROMO").select("p_brand", "p_size")
        .intersect(p.filter(col("p_retailprice") > 950.0).select("p_brand", "p_size"))
        .orderBy("p_brand", "p_size")
    },

    oracle(
      "q17_except",
      """SELECT p_brand, p_size FROM part WHERE p_type = 'PROMO'
        |EXCEPT
        |SELECT p_brand, p_size FROM part WHERE p_retailprice > 950.0
        |ORDER BY p_brand, p_size""",
      "SURVEY §2.6: EXCEPT (distinct) for re-run diffing") { (s, d) =>
      val p = t(s, d, "part")
      p.filter(col("p_type") === "PROMO").select("p_brand", "p_size")
        .except(p.filter(col("p_retailprice") > 950.0).select("p_brand", "p_size"))
        .orderBy("p_brand", "p_size")
    },

    // §2.7 scalar surface: md5 checksum (A6), zero-pad (F19), translate
    // (F11), concat_ws (F14), ws-normalize (F12), regexp (F10), length.
    oracle(
      "q18_scalar_surface",
      s"""SELECT doc_id,
         |  md5(text) AS checksum,
         |  ${pageNameSql("doc_id")} AS page_name,
         |  translate(source, 'src', 'SRC') AS source_uc,
         |  concat_ws('/', lang, source) AS lang_path,
         |  substr(${normWsSql("text")}, 1, 40) AS norm_prefix,
         |  regexp_replace(source, '[0-9]+', 'N', 'g') AS source_t,
         |  CAST(length(text) AS BIGINT) AS text_len,
         |  upper(lang) AS lang_uc
         |FROM documents ORDER BY doc_id""",
      "SURVEY §2.7: consolidated scalar function surface") { (s, d) =>
      graft.sources.Tables.byOrder(s, d, "documents", "doc_id")
        .select(col("doc_id"),
          md5(col("text")).as("checksum"),
          pageName(col("doc_id")).as("page_name"),
          translate(col("source"), "src", "SRC").as("source_uc"),
          concat_ws("/", col("lang"), col("source")).as("lang_path"),
          substring(normWs(col("text")), 1, 40).as("norm_prefix"),
          regexp_replace(col("source"), "[0-9]+", "N").as("source_t"),
          length(col("text")).cast("long").as("text_len"),
          upper(col("lang")).as("lang_uc"))
        .orderBy("doc_id")
    },

    // F11/F19/F20: id⇄path arithmetic (bin/main.py:168,179; bin/dao.py:42-57).
    oracle(
      "q19_id_path",
      s"""SELECT doc_id, host_id, path, tiff,
         |  regexp_replace(tiff, '\\.[^.]+$$', '.jp2') AS jp2
         |FROM (
         |  SELECT doc_id, host_id, path,
         |    path || '/' || ${pageNameSql("doc_id")} || '.tif' AS tiff
         |  FROM (
         |    SELECT doc_id,
         |      upper(source) || '_c' || lpad(doc_id::VARCHAR, 4, '0') AS host_id,
         |      replace(upper(source) || '_c' || lpad(doc_id::VARCHAR, 4, '0'),
         |              '_', '/') AS path
         |    FROM documents))
         |ORDER BY doc_id""",
      "SURVEY §2.2 F11/F19/F20: host_c_id ⇄ path projections") { (s, d) =>
      graft.sources.Tables.byOrder(s, d, "documents", "doc_id")
        .select(col("doc_id"),
          concat(upper(col("source")), lit("_c"),
            lpad(col("doc_id").cast("string"), 4, "0")).as("host_id"))
        .withColumn("path", translate(col("host_id"), "_", "/"))
        .withColumn("tiff",
          concat(col("path"), lit("/"), pageName(col("doc_id")), lit(".tif")))
        .withColumn("jp2", regexp_replace(col("tiff"), "\\.[^.]+$", ".jp2"))
        .orderBy("doc_id")
    },

    // F4 + F5: extension→depth projection + extension filter.
    oracle(
      "q20_ext_depth",
      """SELECT doc_id, lang,
        |  CAST(CASE WHEN lang = 'en' THEN 1 WHEN lang = 'es' THEN 8
        |            ELSE 24 END AS BIGINT) AS img_bits
        |FROM documents
        |WHERE regexp_matches(source, '[02468]$')
        |ORDER BY doc_id""",
      "SURVEY §2.2 F4/F5: extension-class dispatch + suffix filter") { (s, d) =>
      t(s, d, "documents")
        .filter(col("source").rlike("[02468]$"))
        .select(col("doc_id"), col("lang"),
          when(col("lang") === "en", 1L).when(col("lang") === "es", 8L)
            .otherwise(24L).as("img_bits"))
        .orderBy("doc_id")
    },

    // §2.7 date surface (bin/dao.py:19-20 ISO stamps; mtime ordering).
    oracle(
      "q21_date_surface",
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS om,
        |  CAST(year(o_orderdate) AS BIGINT) AS oy,
        |  CAST(month(o_orderdate) AS BIGINT) AS omn,
        |  CAST(day(o_orderdate) AS BIGINT) AS odom
        |FROM orders ORDER BY o_orderkey""",
      "SURVEY §2.7: date_format / date_trunc / extract surface") { (s, d) =>
      graft.sources.Tables.byOrder(s, d, "orders", "o_orderkey")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("om"),
          year(col("o_orderdate")).cast("long").as("oy"),
          month(col("o_orderdate")).cast("long").as("omn"),
          dayofmonth(col("o_orderdate")).cast("long").as("odom"))
        .orderBy("o_orderkey")
    },

    // F17 + F18: resize rounding and JP2 level-count math
    // (bin/main.py:299-305, 377-385). All-integer formulation: DuckDB
    // rounds double→int casts while Spark truncates, so both sides go
    // through floor() explicitly.
    oracle(
      "q22_rounding_levels",
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice / 100.0) AS BIGINT) * 100 AS resize_target,
        |  CAST(length(format('{:b}', CAST(floor(o_totalprice) AS BIGINT) // 96))
        |       AS BIGINT) AS jp2_levels
        |FROM orders ORDER BY o_orderkey""",
      "SURVEY §2.2 F17/F18: floor-to-100 resize + halving-count levels") { (s, d) =>
      graft.sources.Tables.byOrder(s, d, "orders", "o_orderkey")
        .select(col("o_orderkey"),
          (floor(col("o_totalprice") / 100.0).cast("long") * 100).as("resize_target"),
          length(bin(expr("floor(o_totalprice) div 96"))).cast("long").as("jp2_levels"))
        .orderBy("o_orderkey")
    },

    // JSON props extraction (driver events table; engine extension).
    oracle(
      "q23_json_props",
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""",
      "JSON property extraction + integer aggregation") { (s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    },

    // S11 / §2.8: incremental mtime scan — process only rows newer than the
    // checkpoint (bin/batch.sh:24-27). The predicate is a plain column
    // compare → parquet min/max pruning at scale.
    oracle(
      "q24_incremental_scan",
      s"""SELECT event_type, COUNT(*) AS n,
         |  ${fmtTsSql("min(ts)")} AS first_ts,
         |  ${fmtTsSql("max(ts)")} AS last_ts
         |FROM events
         |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
         |GROUP BY 1 ORDER BY 1""",
      "SURVEY §2.8: checkpoint-relative incremental scan") { (s, d) =>
      // 2024-01-15T00:00:00Z in epoch micros; raw-nanos predicate pushes
      // to the parquet scan (see Tables.eventsSince scaladoc).
      Tables.eventsSince(s, d, 1705276800000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          fmtTs(min(col("ts"))).as("first_ts"),
          fmtTs(max(col("ts"))).as("last_ts"))
        .orderBy("event_type")
    },

    // F7 analog on pure data: first-occurrence-wins (idempotent re-run).
    oracle(
      "q25_first_wins",
      """SELECT user_id, event_type, min(event_id) AS first_event_id
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
      "SURVEY §2.8: idempotent first-occurrence-wins dedup") { (s, d) =>
      t(s, d, "events")
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event_id"))
        .orderBy("user_id", "event_type")
    },

    // Engine extension (SURVEY §2.4 note): distinct aggregation — the
    // shuffle-heavy shape worth covering explicitly. Spark plans
    // count(DISTINCT) as expand + two-phase agg; at scale prefer
    // approx_count_distinct (HLL) — asserted within tolerance in the
    // ScalaTest spec since HLL implementations differ across engines.
    oracle(
      "q44_distinct_counts",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""",
      "distinct aggregation (expand + two-phase)") { (s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // Engine extension: ROLLUP grouping sets (subtotals + grand total).
    // NULLS FIRST in the oracle ORDER BY matches Spark's asc default.
    oracle(
      "q45_rollup",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${decSumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "rollup grouping sets") { (s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(decSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    },

    // Engine extension: running-frame window aggregate. The running sum
    // goes through DECIMAL so every prefix is exact — a raw double
    // running sum would accumulate engine-specific rounding row by row.
    oracle(
      "q46_running_total",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""",
      "window frame: exact running total per customer") { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
            .over(w).cast("double").as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Engine extension: lag/lead analytics (inter-event deltas).
    oracle(
      "q47_lag_delta",
      s"""SELECT user_id, event_id,
         |  ${fmtTsSql("ts")} AS ts_s,
         |  CAST(floor(epoch(ts)) AS BIGINT)
         |    - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS gap_s,
         |  value - lag(value) OVER w AS value_delta
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |ORDER BY user_id, event_id""",
      "window analytics: lag deltas per user") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          fmtTs(col("ts")).as("ts_s"),
          (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
            .as("gap_s"),
          (col("value") - lag(col("value"), 1).over(w)).as("value_delta"))
        .orderBy("user_id", "event_id")
    },

    // Engine extension: AS-OF join — for each error event, the most
    // recent preceding purchase by the same user. Composed per the
    // custom-operator preference order (SURVEY §7.1(a)): union the two
    // streams and carry the last purchase forward with an ignore-nulls
    // window — one shuffle on user_id, no per-row backward scan, no
    // custom SparkPlan needed. The struct payload keeps (id, ts) from
    // the SAME matched row.
    oracle(
      "q48_asof_join",
      s"""WITH t AS (SELECT user_id, event_id, ts, event_type FROM events
         |           WHERE event_type IN ('purchase', 'error')),
         |m AS (SELECT user_id, event_id, ts, event_type,
         |        last_value(CASE WHEN event_type = 'purchase' THEN event_id END
         |                   IGNORE NULLS) OVER w AS purchase_id,
         |        last_value(CASE WHEN event_type = 'purchase' THEN ts END
         |                   IGNORE NULLS) OVER w AS pts
         |      FROM t
         |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |                   ROWS UNBOUNDED PRECEDING))
         |SELECT user_id, event_id, ${fmtTsSql("ts")} AS ts_s,
         |  purchase_id, ${fmtTsSql("pts")} AS purchase_ts
         |FROM m WHERE event_type = 'error'
         |ORDER BY user_id, event_id""",
      "as-of join via union + ignore-nulls carry-forward window") { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "error"))
        .withColumn("p",
          last(when(col("event_type") === "purchase",
            struct(col("event_id").as("pid"), col("ts").as("pts"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), fmtTs(col("ts")).as("ts_s"),
          col("p.pid").as("purchase_id"),
          fmtTs(col("p.pts")).as("purchase_ts"))
        .orderBy("user_id", "event_id")
    },

    // Engine extension: pivot as explicit CASE columns — deterministic
    // column set/order (df.pivot infers columns from data, which breaks
    // schema stability across runs and engines).
    oracle(
      "q49_pivot_status",
      s"""SELECT user_id,
         |  ${Seq("click", "error", "purchase", "signup", "view").map(t =>
              s"CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS v_$t")
              .mkString(",\n  ")}
         |FROM events GROUP BY user_id ORDER BY user_id""",
      "pivot via deterministic CASE columns") { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      val aggCols = types.map(t =>
        sum(when(col("event_type") === t, col("value"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 6)))
          .cast("double").as(s"v_$t"))
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(aggCols.head, aggCols.tail: _*)
        .orderBy("user_id")
    },

    // Engine extension: exact interpolated percentiles. Spark's
    // percentile() and DuckDB's quantile_cont() share the definition
    // (rank p·(n−1), linear interpolation) and match bit-for-bit on this
    // data — verified empirically including non-terminating doubles.
    // At 100 TB prefer approx_percentile (t-digest); exact percentile
    // holds the whole group's values.
    oracle(
      "q50_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_extendedprice, 0.5) AS p50_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""",
      "exact interpolated percentiles per group") { (s, d) =>
      // ONE percentile buffer for both l_quantity percentiles (round 15):
      // two scalar percentile() aggs on the same column each built their
      // own value->count OpenHashMap over every row (boxed doubles); the
      // array form builds the map once and reads both percentages off it
      // with the identical per-percentage interpolation (same
      // Percentile.getPercentile call per element), so results are
      // bit-identical and the heaviest buffer is built once, not twice.
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.5D, 0.9D))").as("p_qty"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_price"))
        .select(col("l_returnflag"),
          element_at(col("p_qty"), 1).as("p50_qty"),
          element_at(col("p_qty"), 2).as("p90_qty"),
          col("p50_price"))
        .orderBy("l_returnflag")
    },

    // F9: completeness assertion before mutation (bin/main.py:509-517).
    oracle(
      "q26_completeness",
      """SELECT o_orderkey, n_lines
        |FROM orders JOIN (
        |  SELECT l_orderkey AS k, COUNT(*) AS n_lines,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_returned
        |  FROM lineitem GROUP BY 1) ON o_orderkey = k
        |WHERE n_returned = 0 AND o_totalprice > 0.0
        |ORDER BY o_orderkey""",
      "SURVEY §2.2 F9: multi-flag completeness gate") { (s, d) =>
      val lagg = t(s, d, "lineitem")
        .groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
      t(s, d, "orders")
        .join(lagg, col("o_orderkey") === col("k"))
        .filter(col("n_returned") === 0L && col("o_totalprice") > 0.0)
        .select("o_orderkey", "n_lines")
        .orderBy("o_orderkey")
    })
}

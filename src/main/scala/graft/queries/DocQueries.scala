package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.oracle
import graft.operators.DocOps
import graft.sources.Tables

/** Document-shaped output (SURVEY §2.4 A1, §2.1 S15): nested grouped
  * documents and their XML rendering. The nested array<struct> is built by
  * [[DocOps.groupToDoc]] and then projected to a deterministic scalar
  * rendering so the driver harness can hash it (round-1 lesson: a raw
  * array<struct> column is unhashable in the oracle comparison) —
  * members serialize to strings in sorted-struct order, the q09
  * total-order discipline. */
object DocQueries {

  val defs: Seq[QueryDef] = Seq(

    // The nested doc is materialized (groupToDoc → sorted array<struct>),
    // then each member is rendered to a canonical scalar string and the
    // array joined — so the driver hash-checks both group membership and
    // intra-group order. Doubles render through floor() before the int
    // cast on BOTH engines (DuckDB CAST rounds, Spark truncates);
    // extendedprice renders as exact cents.
    oracle(
      "q42_group_doc_nested",
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_members,
        |  string_agg(
        |    '[' || l_linenumber || '|' || l_partkey || '|' || l_suppkey
        |      || '|' || CAST(floor(l_quantity) AS BIGINT)
        |      || '|' || CAST(floor(l_extendedprice * 100) AS BIGINT) || ']',
        |    '' ORDER BY l_linenumber, l_partkey, l_suppkey,
        |              l_quantity, l_extendedprice) AS members_str
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""",
      "SURVEY §2.4 A1: folder→member nested document, hashable rendering") { (s, d) =>
      DocOps.groupToDoc(Tables(s, d, "lineitem"),
          groupKey = "l_orderkey",
          memberCols = Seq("l_partkey", "l_quantity", "l_extendedprice"),
          sortCols = Seq("l_linenumber", "l_partkey", "l_suppkey"))
        .withColumn("members_str", expr(
          """array_join(transform(members, m -> concat(
            |  '[', m.l_linenumber, '|', m.l_partkey, '|', m.l_suppkey,
            |  '|', CAST(floor(m.l_quantity) AS BIGINT),
            |  '|', CAST(floor(m.l_extendedprice * 100) AS BIGINT), ']')), '')""".stripMargin))
        .select("l_orderkey", "n_members", "members_str")
        .orderBy("l_orderkey")
    },

    oracle(
      "q43_mets_render",
      """SELECT l_orderkey,
        |  '<folder id="' || l_orderkey || '">'
        |    || string_agg(m, '' ORDER BY m)
        |    || '</folder>' AS xml
        |FROM (SELECT l_orderkey,
        |        '<file n="' || l_linenumber || '" q="'
        |          || CAST(floor(l_quantity) AS BIGINT) || '"/>' AS m
        |      FROM lineitem)
        |GROUP BY l_orderkey ORDER BY l_orderkey""",
      "SURVEY §2.1 S15: grouped document → METS-like XML render") { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"),
          concat(lit("<file n=\""), col("l_linenumber"), lit("\" q=\""),
            floor(col("l_quantity")).cast("long"), lit("\"/>")).as("m"))
        .groupBy("l_orderkey")
        .agg(concat(lit("<folder id=\""), col("l_orderkey"), lit("\">"),
          array_join(array_sort(collect_list(col("m"))), ""),
          lit("</folder>")).as("xml"))
        .orderBy("l_orderkey")
    })
}

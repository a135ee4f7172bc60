package graft.queries

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.QueryDef.{oracle, rowsOnly}
import graft.operators.DocOps
import graft.sources.Tables

/** Document-shaped output (SURVEY §2.4 A1, §2.1 S15): nested grouped
  * documents and their XML rendering. The nested form is not
  * ANSI-SQL-expressible (driver records rows-only); the rendered XML
  * string IS oracle-checked — members serialize to strings first and
  * sort lexicographically, the q09 total-order discipline. */
object DocQueries {

  val defs: Seq[QueryDef] = Seq(

    rowsOnly(
      "q42_group_doc_nested",
      "SURVEY §2.4 A1: folder→member nested document (array<struct> output)") { (s, d) =>
      DocOps.groupToDoc(Tables(s, d, "lineitem"),
          groupKey = "l_orderkey",
          memberCols = Seq("l_partkey", "l_quantity", "l_extendedprice"),
          sortCols = Seq("l_linenumber", "l_partkey", "l_suppkey"))
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
        |          || CAST(l_quantity AS BIGINT) || '"/>' AS m
        |      FROM lineitem)
        |GROUP BY l_orderkey ORDER BY l_orderkey""",
      "SURVEY §2.1 S15: grouped document → METS-like XML render") { (s, d) =>
      Tables(s, d, "lineitem")
        .select(col("l_orderkey"),
          concat(lit("<file n=\""), col("l_linenumber"), lit("\" q=\""),
            col("l_quantity").cast("long"), lit("\"/>")).as("m"))
        .groupBy("l_orderkey")
        .agg(concat(lit("<folder id=\""), col("l_orderkey"), lit("\">"),
          array_join(array_sort(collect_list(col("m"))), ""),
          lit("</folder>")).as("xml"))
        .orderBy("l_orderkey")
    })
}

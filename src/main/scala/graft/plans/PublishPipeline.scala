package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DocOps

/** The publish dataflow (SURVEY §3.2, `bin/publish.rb:36-146`) as one
  * checkpointed pipeline — the engine's second reference entry point,
  * composed entirely from the operator library:
  *
  *   component-dir scan → F6 non-dot filter (`publish.rb:69`) →
  *   F7 anti-join vs existing PDFs (`publish.rb:72`) →
  *   S6/J1 broadcast title join + F13 quote-strip + F14 concat
  *   (`publish.rb:77-81`) → W1/F19 page numbering + A1/S15 grouped METS
  *   (`publish.rb:92-109`; `bin/dirtopdf.sh:95-98`) →
  *   J3 dao insertion attributes (`publish.rb:120-141`, id⇄path F11).
  *
  * Each stage checkpoints via [[Pipeline.run]]; a stopped publish
  * resumes at the first incomplete stage. Inputs:
  * `components(component_id, name)`, `existingPdfs(component_id)`,
  * `titles(component_id, unittitle, unitdate)` (the web-service lookup
  * as a fixture table — at scale an HttpOps adapter),
  * `pages(component_id, path)`.
  */
object PublishPipeline {

  def run(spark: SparkSession, components: DataFrame, existingPdfs: DataFrame,
      titles: DataFrame, pages: DataFrame, checkpointRoot: String): DataFrame = {

    val stages = Seq(
      // F6: skip dir entries containing '.'
      Pipeline.Stage("candidates", df => df.filter(!col("name").contains("."))),

      // F7: only components whose PDF does not already exist
      Pipeline.Stage("pending",
        df => Incremental.notYetDone(df, existingPdfs, "component_id")),

      // S6/J1 + F13/F14: broadcast title lookup, strip quotes, concat
      // title and date (publish.rb:80-81)
      Pipeline.Stage("titled", { df =>
        df.join(broadcast(titles), Seq("component_id"), "left")
          .withColumn("title", regexp_replace(
            concat_ws(", ", col("unittitle"), col("unitdate")), "\"", ""))
          .drop("unittitle", "unitdate")
      }),

      // W1/F19 + A1/S15: number pages in lexicographic path order,
      // group to a document, render the METS-like XML per component
      Pipeline.Stage("mets", { df =>
        val w = Window.partitionBy("component_id").orderBy("path")
        val numbered = pages
          .withColumn("seq", row_number().over(w).cast("long"))
          .withColumn("page_name", format_string("%08d.tif", col("seq")))
          .select("component_id", "seq", "page_name")
        val docs = DocOps.groupToDoc(numbered, "component_id",
          Seq("page_name"), Seq("seq"))
        val mets = DocOps.renderXml(docs, "component_id", "mets",
          """concat('<file seq="', m.seq, '" name="', m.page_name, '"/>')""")
        df.join(mets.select(col("component_id"), col("n_members").as("n_pages"),
          col("xml").as("mets")), Seq("component_id"), "left")
      }),

      // J3 + F11: the dao attributes inserted into the EAD — href from
      // the id⇄path projection, show set only when a METS was produced
      Pipeline.Stage("dao_insert", { df =>
        df.withColumn("dao_href", concat(lit("http://store/"),
            regexp_replace(col("component_id"), "_", "/"), lit(".pdf")))
          .withColumn("dao_show",
            when(col("mets").isNotNull, lit("new")))
      }))

    Pipeline.run(spark, components, checkpointRoot, stages)
  }
}

package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.JdbcWorkQueue

/** The DB-driven relocation dataflow (SURVEY §3.3,
  * `bin/pulfarize.rb:99-116`) as one checkpointed pipeline — the
  * engine's third reference entry point:
  *
  *   S12 JDBC work-queue scan with the pushed `Note = ' '` predicate
  *   (`pulfarize.rb:101`) → F10 URL-prefix strip (`pulfarize.rb:28`) →
  *   F5 extension filter + A3 existing-count offset
  *   (`pulfarize.rb:59-68`) → W2 offset renumbering + F19 `%08d` names
  *   (`pulfarize.rb:71-77`) → move plan (src → dest), execution
  *   delegated to [[TwoPhaseSink]]-style never-overwrite promotion.
  *
  * Inputs: the queue lives in the database at `url`/`table` (columns
  * `id`, `dir`, `Note`); `files(dir, path, name)` is the source-store
  * listing; `targetListing(dir, name)` is the destination store (its
  * per-dir counts seed the renumbering offset — A3). `ext` selects the
  * store being relocated (`.jp2` / `.tif`, `pulfarize.rb:104-107`).
  */
object RelocatePipeline {

  def run(spark: SparkSession, url: String, table: String, files: DataFrame,
      targetListing: DataFrame, ext: String, checkpointRoot: String): DataFrame = {

    val queue = JdbcWorkQueue.pending(spark, url, table)

    val stages = Seq(
      // F10: strip the collection-URL prefix to the canonical dir key
      Pipeline.Stage("strip", df => df.withColumn("dir",
        regexp_replace(col("dir"),
          "^http://findingaids[.]example/collections/", ""))),

      // F5 + A3: files of the target extension joined to the queue dirs,
      // with the numbering seed from the destination dir. The reference
      // seeds from the COUNT of existing files (`pulfarize.rb:59-68`),
      // which collides when existing numbering has gaps (1 and 3 present
      // → count 2 → next file planned as 3, already taken, and the
      // never-overwrite sink would silently skip it). Seed from
      // greatest(count, max existing sequence) so planned names are
      // always fresh.
      Pipeline.Stage("collect", { df =>
        val counts = targetListing
          .filter(col("name").endsWith(ext))
          .groupBy("dir").agg(
            count(lit(1)).as("n_existing"),
            max(expr("CAST(regexp_extract(name, '^([0-9]{8})', 1) AS BIGINT)"))
              .as("max_seq"))
        df.join(files.filter(col("name").endsWith(ext)), Seq("dir"))
          .join(counts, Seq("dir"), "left")
          .withColumn("existing", greatest(
            coalesce(col("n_existing"), lit(0L)),
            coalesce(col("max_seq"), lit(0L))))
          .drop("n_existing", "max_seq")
      }),

      // W2 + F19: continue numbering after the existing count, in
      // lexicographic source-name order (O1)
      Pipeline.Stage("renumber", { df =>
        val w = Window.partitionBy("dir").orderBy("name")
        df.withColumn("seq", row_number().over(w).cast("long") + col("existing"))
          .withColumn("dest_name", format_string(s"%08d$ext", col("seq")))
      }),

      // the move plan: src path → dest path (never-overwrite execution
      // is the promotion sink's contract, not a projection concern)
      Pipeline.Stage("plan_moves", df => df.select(
        col("id"), col("dir"), col("path").as("src"),
        concat(col("dir"), lit("/"), col("dest_name")).as("dest"),
        col("seq"))))

    Pipeline.run(spark, queue, checkpointRoot, stages)
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-store scans (SURVEY §2.1 S7–S11): directory trees of
  * images/PDFs as DataFrames via Spark's `binaryFile` source —
  * (path, modificationTime, length, content).
  *
  * The reference walks these trees imperatively (`Dir.glob` at
  * `bin/publish.rb:64-66`, `find` at `bin/dirtopdf.sh:78-96`,
  * sorted `os.listdir` at `bin/main.py:269-270`); here a listing IS a
  * DataFrame, so filters/orders/joins on it are ordinary pushdown-able
  * operators, and at 100 TB the listing parallelizes like any scan.
  */
object BinaryFiles {

  /** Recursive scan filtered by glob — `find -name '*.tif'` (S10). */
  def scan(spark: SparkSession, root: String, glob: String = "*",
      withContent: Boolean = false): DataFrame = {
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
    if (withContent) df else df.drop("content")
  }

  /** Listing + derived path columns: base name, extension, parent dir —
    * the F11/F15 path decompositions (`bin/dao.py:42-57`). */
  def listing(spark: SparkSession, root: String, glob: String = "*"): DataFrame =
    scan(spark, root, glob)
      .withColumn("name", element_at(split(col("path"), "/"), -1))
      .withColumn("ext", lower(element_at(split(col("name"), "\\."), -1)))
      .withColumn("dir", expr("substring(path, 1, length(path) - length(name) - 1)"))

  /** Page ordering: lexicographic name order within each directory with a
    * 1-based sequence — the sorted-listing + renumber idiom (W1/O1,
    * `bin/main.py:269-281`). */
  def pageOrdered(files: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    files.withColumn("seq",
      row_number().over(Window.partitionBy("dir").orderBy("name")).cast("long"))
      .withColumn("page_name", format_string("%08d", col("seq")))
  }
}

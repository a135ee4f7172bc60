package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** S12: the JDBC work-queue scan — `SELECT * FROM ImageDirs where
  * Note=" "` (`bin/pulfarize.rb:99-106`; `bin/makepdf.rb:39-54`) as a
  * Spark JDBC source with the status predicate pushed down into the
  * database query.
  *
  * The embedded database here is Derby (it ships in Spark's own jars;
  * the reference's SQLite is equally embedded — same shape, different
  * file format). Against a production DB server only the URL/driver
  * change. Scale notes: a work queue is tiny by contract — the 100 TB
  * lives in the stores the queue rows point at — so the right plan is a
  * single-partition JDBC scan with the `Note` predicate pushed down
  * (`PushedFilters` in the explain; the DB does the filtering, the
  * engine never sees claimed rows) that then drives partitioned work via
  * joins against the big file listings. For a genuinely large queue,
  * `partitionColumn`/`numPartitions` shard the scan.
  */
object JdbcWorkQueue {

  /** Embedded Derby driver (derbytools.jar, on the Spark classpath). */
  val derbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** In-memory Derby database URL (per-JVM; auto-created). */
  def derbyMemUrl(db: String): String = s"jdbc:derby:memory:$db;create=true"

  /** Plain JDBC scan of `table`. */
  def scan(spark: SparkSession, url: String, table: String,
      driver: String = derbyDriver): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", driver)
      .load()

  /** Pending work: rows whose `noteCol` equals a single space — the
    * reference's "unclaimed" flag (`bin/pulfarize.rb:101`). The equality
    * predicate pushes into the database query, not a post-scan filter. */
  def pending(spark: SparkSession, url: String, table: String,
      noteCol: String = "Note", driver: String = derbyDriver): DataFrame =
    scan(spark, url, table, driver).filter(col(noteCol) === " ")

  /** Rows above which [[seed]] refuses to run: the seeder drains the
    * DataFrame to the driver (`collect()`), which is only sane for the
    * work-queue fixture — NEVER point it at a corpus table. */
  val MaxSeedRows: Long = 100000L

  /** Seed (drop + recreate + insert) `table` from a bounded DataFrame —
    * the fixture harness for the embedded DB. Work-queue tables are
    * driver-sized by contract, so this collects — guarded by
    * [[MaxSeedRows]] so the contract is enforced, not just documented.
    * Column names are quoted to preserve case (Derby uppercases unquoted
    * identifiers, which would break column-name parity with the oracle). */
  def seed(df: DataFrame, url: String, table: String,
      driver: String = derbyDriver): Unit = synchronized {
    val n = df.count()
    require(n <= MaxSeedRows,
      s"JdbcWorkQueue.seed drains to the driver: $n rows exceeds the " +
        s"work-queue contract ($MaxSeedRows). This seeder is for bounded " +
        "fixture queues, not corpus tables.")
    Class.forName(driver)
    val schema = df.schema
    def sqlType(dt: DataType): String = dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType => "DOUBLE"
      case StringType => "VARCHAR(1024)"
      case other =>
        throw new IllegalArgumentException(s"unsupported work-queue type: $other")
    }
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => () } // first run: no table
      st.executeUpdate(schema.fields
        .map(f => "\"" + f.name + "\" " + sqlType(f.dataType))
        .mkString(s"CREATE TABLE $table (", ", ", ")"))
      st.close()
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (${schema.fields.map(_ => "?").mkString(",")})")
      df.collect().foreach { row =>
        schema.fields.indices.foreach(i => ps.setObject(i + 1, row.get(i)))
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingestion, seeds, partitioned writes, and load-audit capture —
  * the reference's raw layer (reference
  * `data_gen/generate_and_load_script.py:174-217`: CSV loads into the
  * warehouse with schema autodetect + truncate semantics;
  * `dbt_project.yml:52-56`: seed CSVs; `models/schema.yml:122-141`:
  * `raw_audit` reconciliation; `README.md:24`: raw partitions by
  * source/date).
  *
  * Two read modes mirror the reference's contract: `readCsvInfer` =
  * BigQuery-autodetect parity; `readCsvWithRejects` = strict canonical
  * schema with malformed rows routed to a rejects frame (the SURVEY
  * §1.2 "engine decision") via the PERMISSIVE `_corrupt_record`
  * channel.
  */
object Ingest {

  /** Autodetect-parity read (reference `generate_and_load_script.py:187`
    * `autodetect=True`). Schema inference scans the file once extra —
    * acceptable for seed-sized CSVs, never for fact loads. */
  def readCsvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path)

  /** All-columns-string read: the untyped raw layer, cast at staging
    * (reference defers decimal casts to dbt models,
    * `generate_and_load_script.py:18`). */
  def readCsvRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Strict-schema read with reject routing: rows that do not conform
    * are captured whole in `_corrupt_record` and returned as the second
    * frame (raw line preserved for quarantine/replay). */
  def readCsvWithRejects(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt_record", StringType, true))
    val df = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      // corrupt-record column requires referencing raw rows once;
      // released via InternalCache.release() like other internal caches
      .transform(graft.operators.InternalCache.persist(_))
    val clean = df.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val rejects = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (clean, rejects)
  }

  /** Seed lookup CSV (reference `dbt_project.yml:52-56`,
    * `README.md:21-23`): header, comma-delimited. Seeds are dim-sized
    * by contract — callers broadcast them into joins. */
  def seed(spark: SparkSession, name: String,
      dir: String = "/root/repo/seeds"): DataFrame =
    readCsvInfer(spark, s"$dir/$name.csv")

  /** Same, with an explicit schema (exact decimal rates etc.). */
  def seedTyped(spark: SparkSession, name: String, schema: StructType,
      dir: String = "/root/repo/seeds"): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(s"$dir/$name.csv")

  /** Partitioned parquet write (reference raw partitions "by source and
    * date", `README.md:24`): overwrite for full rebuilds, append for
    * incremental daily loads (`README.md:82` `--day` runs). Partition
    * pruning on the partition columns is then free for every reader. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], mode: String): Unit =
    // cluster rows by target partition first: otherwise every shuffle
    // task writes a file into every partition it touches (tasks ×
    // partitions small files — the classic partitioned-write explosion)
    df.repartition(partitionCols.map(col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Recursively delete a path (idempotent ingest-target reset). */
  def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Load-audit frame (reference `raw_audit`,
    * `models/schema.yml:122-141`): one row per table with the loaded
    * row count; `loadTs` injected for reproducibility. Distributed
    * counts — nothing is collected. */
  def audit(tables: Seq[(String, DataFrame)],
      loadTs: java.sql.Timestamp): DataFrame =
    tables.map { case (name, df) =>
      df.agg(count(lit(1)).as("load_rows"))
        .select(lit(name).as("table_name"),
          col("load_rows"), lit(loadTs).as("load_ts"))
    }.reduce(_ unionByName _)
}

package graft.sinks

import org.apache.spark.sql.DataFrame
import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Sinks for the snapshot report (SURVEY.md §2.10 K1).
  *
  * The reference appends one wide row per task to a single CSV with a
  * header-once rule (main.py:345-351). Two renderings:
  *
  *  - [[appendPartitioned]]: the production path — Parquet `append`
  *    partitioned by a time-derived column, so each hourly tick lands
  *    as new files in its partition and readers prune by partition.
  *    This is the scalable UNION-ALL-of-batches the CSV emulates.
  *
  *  - [[appendCsvSingleFile]]: byte-level fidelity with the reference:
  *    a single local CSV, header written only when the file is new or
  *    empty. Spark writes the batch distributed (headerless part
  *    files); the driver then concatenates them onto the target —
  *    suitable for the reference's 1-row-per-task cadence, documented
  *    as NOT the 100 TB path.
  */
object ReportSink {

  /** `format` is any columnar source Spark ships ("parquet" default,
    * "orc" equally supported) — both carry column stats for pruning and
    * partition-directory layout for pruning by `partitionCols`. */
  def appendPartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                        format: String = "parquet"): Unit =
    df.write.mode("append").partitionBy(partitionCols: _*).format(format).save(path)

  /** Bucketed (and optionally sort-ordered) managed-table write: pays
    * the hash shuffle ONCE at write time, after which every equi-join
    * or aggregation on the bucket keys between same-bucketed tables is
    * EXCHANGE-FREE — the co-located-join strategy the 100 TB fact
    * tables (lineitem ⋈ orders, history ⋈ tasks) should be stored
    * under. Asserted by BucketingSpec: a join of two such tables plans
    * with zero shuffle exchanges. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Deterministic hash-sharded, sort-clustered corpus layout — the
    * shape a training-data pipeline actually ships (WebDataset/TFRecord
    * shard conventions): shard = portableHash(key) mod nShards, one
    * directory per shard, rows inside each file ordered by `sortCols`.
    *
    * Properties that matter at 100 TB:
    *  - shard assignment is a PURE function of the row key — stable
    *    under reruns, partitioning, and cluster size (unlike
    *    repartitionByRange, whose sampled boundaries shift with the
    *    data), so incremental rebuilds touch only changed shards and
    *    the assignment is oracle-checkable (q72 hash-matches
    *    [[shardOf]] row by row against the DuckDB mirror);
    *  - one shuffle total: repartition by the shard column, then an
    *    in-partition sort (no global sort, no range exchange);
    *  - dynamic partition dirs (`partitionBy(shardCol)`) let readers
    *    open exactly the shards they want; `maxRecordsPerFile` bounds
    *    file sizes inside hot shards.
    * Returns the shard column name written. */
  def writeHashSharded(df: DataFrame, path: String, nShards: Int,
                       keyCol: String, sortCols: Seq[String],
                       maxRecordsPerFile: Long = 0L,
                       shardCol: String = "shard"): String = {
    import org.apache.spark.sql.functions._
    // refuse to silently overwrite user data with the derived column
    require(!df.columns.contains(shardCol),
      s"input already has a '$shardCol' column - pass a different shardCol")
    val sharded = df.withColumn(shardCol, shardOf(col(keyCol), nShards))
      .repartition(nShards, col(shardCol))
      .sortWithinPartitions(col(shardCol) +: sortCols.map(col): _*)
    sharded.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(shardCol).parquet(path)
    shardCol
  }

  /** The pure shard-assignment function behind [[writeHashSharded]]:
    * `pmod(portableHash(cast(key as string), 97), nShards)`. Null keys
    * go DETERMINISTICALLY to shard 0 — a null hash would otherwise
    * yield a null shard and dump the rows into
    * `__HIVE_DEFAULT_PARTITION__`, invisible to shard-addressed
    * readers. Exposed so q72 oracle-checks the exact expression the
    * writer uses. */
  def shardOf(key: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(nShards > 0, s"nShards=$nShards must be positive")
    when(key.isNull, lit(0L)).otherwise(
      pmod(graft.functions.TextFunctions.portableHash(key.cast("string"), seed = 97),
           lit(nShards.toLong)))
      .cast("long")
  }

  /** Morton (Z-order) key: interleaves the low `bits` bits of two
    * non-negative int columns — x's bit i lands at position 2i, y's at
    * 2i+1 — so sorting by the key clusters rows that are close in BOTH
    * dimensions. The layout primitive behind multi-dimensional data
    * skipping: a file holding a contiguous z-range covers a bounded
    * rectangle of (x, y) space, so per-file min/max stats prune 2-D
    * range queries that a single-column sort can only prune on its one
    * sort key. Pure integer shift/mask arithmetic (codegen'd built-ins,
    * engine-portable bit for bit); q108 oracle-checks the exact
    * expression and measures the skipping win in-engine. */
  def zOrderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _).cast("long")
  }

  /** The DuckDB mirror of [[zOrderKey]] — the same shift/mask formula
    * as SQL text, exposed so the q108 oracle runs the writer's exact
    * expression. */
  def zOrderSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Z-ordered corpus layout: assigns each row the [[zOrderKey]] of
    * (`xCol`, `yCol`), splits the key space into 2^`fileBits`
    * CONTIGUOUS z-ranges (file id = zkey >> (2·bits − fileBits) —
    * deterministic, no range-sampling exchange), and writes one
    * partition dir per range with rows z-sorted inside. Readers prune
    * on the dir id exactly as they would on parquet min/max stats:
    * each dir covers a bounded (x, y) rectangle. One shuffle total
    * (repartition on the file id), same as [[writeHashSharded]].
    * Returns the file-id column name written. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int = 8, fileBits: Int = 6,
                    fileCol: String = "zfile"): String = {
    import org.apache.spark.sql.functions._
    require(fileBits >= 1 && fileBits <= 2 * bits,
      s"fileBits=$fileBits out of range for bits=$bits")
    require(!df.columns.contains(fileCol),
      s"input already has a '$fileCol' column - pass a different fileCol")
    val zc = "__zkey"
    require(!df.columns.contains(zc), s"input already has a '$zc' column")
    val keyed = df.withColumn(zc, zOrderKey(col(xCol), col(yCol), bits))
      .withColumn(fileCol, shiftright(col(zc), 2 * bits - fileBits).cast("long"))
      .repartition(1 << fileBits, col(fileCol))
      .sortWithinPartitions(col(fileCol), col(zc))
      .drop(zc)
    keyed.write.mode("overwrite").partitionBy(fileCol).parquet(path)
    fileCol
  }

  /** Atomic hourly append — the commit-protocol story plain
    * `mode("append")` lacks (round-6 advice: a retried append at 100 TB
    * can leave readers seeing half a batch). Three layers make a batch
    * all-or-nothing:
    *
    *  1. TASK retry: Spark's file committer writes every task's output
    *     under the job's `_temporary` attempt dir and promotes it by
    *     rename at task commit — a re-executed task can never leave two
    *     copies, and failed-attempt files are invisible to any reader.
    *  2. JOB retry: each append lands in its OWN `batch=<id>`
    *     subdirectory written with `overwrite` — re-running a batch
    *     after a crash between write and downstream bookkeeping
    *     REPLACES its directory instead of appending duplicates (the
    *     exact idempotence contract the streaming ingest makes,
    *     [[graft.streaming.EventStreams.ingestToPartitionedSink]]).
    *  3. READER isolation: the committer drops `_SUCCESS` in the batch
    *     dir only at JOB commit, and [[readCommittedBatches]] reads
    *     exclusively `_SUCCESS`-bearing batch dirs — a batch that died
    *     mid-write (files present, no marker) does not exist as far as
    *     consumers are concerned. ReportSinkSpec proves exactly that.
    *
    * This is the same staged-publish design a transactional table
    * format (Delta/Iceberg) implements with a metadata log; with no
    * table-format dependency available, the `_SUCCESS` gate per batch
    * dir is the filesystem-native equivalent (one marker rename = the
    * commit point). Concurrent APPENDERS compose too: distinct batch
    * ids write disjoint directories, so no two jobs ever race on a
    * file.
    */
  def appendAtomicBatch(df: DataFrame, path: String, batchId: String,
                        partitionCols: Seq[String] = Nil,
                        format: String = "parquet"): Unit = {
    require(batchId.nonEmpty && !batchId.contains("/"),
      s"batchId '$batchId' must be a non-empty single path segment")
    val w = df.write.mode("overwrite").format(format)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(s"$path/batch=$batchId")
  }

  /** The read side of [[appendAtomicBatch]]'s contract: only batches
    * whose directory carries the job-commit `_SUCCESS` marker are
    * visible. Returns None when no batch has committed yet (schema
    * unknowable). `batch` and the partition columns surface as data
    * columns via basePath partition discovery. */
  def readCommittedBatches(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           format: String = "parquet"): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.toString).sorted
    if (committed.isEmpty) None
    else Some(spark.read.option("basePath", path).format(format)
      .load(committed.toIndexedSeq: _*))
  }

  def appendCsvSingleFile(df: DataFrame, targetFile: String): Unit = {
    val target = new File(targetFile)
    val writeHeader = !target.isFile || target.length() == 0
    val tmp = Files.createTempDirectory("csv-append").toFile
    val tmpOut = new File(tmp, "batch")
    df.coalesce(1).write
      .option("header", "false")
      .option("emptyValue", "")
      .mode("overwrite")
      .csv(tmpOut.getPath)
    val part = tmpOut.listFiles().filter(_.getName.startsWith("part-")).head
    if (writeHeader) {
      val headerLine = df.columns.map(csvQuote).mkString(",") + "\n"
      Files.writeString(target.toPath, headerLine)
    }
    val out = new FileOutputStream(target, true)
    try Files.copy(part.toPath, out)
    finally out.close()
    // cleanup temp batch dir
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(tmp)
  }

  private def csvQuote(name: String): String =
    if (name.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + name.replace("\"", "\"\"") + "\""
    else name
}

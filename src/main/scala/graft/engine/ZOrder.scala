package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: the MULTI-column data-skipping lever —
  * the Iceberg `rewriteDataFiles(zorder(...))` / Databricks `ZORDER BY`
  * analog for the snapshot layout family ([[BucketedTables]] co-locates
  * one key; this clusters file CONTENTS on two).
  *
  * A table range-sorted on column A gives tight per-file min/max bounds on
  * A and USELESS full-width bounds on B — a filter on B scans every file.
  * Interleaving the bits of both columns' normalized values into one sort
  * key makes each file's (A, B) bounding box a small rectangle, so
  * parquet min/max stats prune files/row-groups for filters on EITHER
  * column. Pay-shuffle-once-at-ingest, like bucketing: one range exchange
  * on the z-value when the layout is written; every later scan benefits.
  *
  * Scale notes: the z-value is a pure per-row codegen expression (an
  * unrolled bit-interleave fold — no UDF); the layout write is ONE
  * `repartitionByRange(zv)` + in-partition sort. Normalization to the
  * bit domain is the caller's contract (integer columns in [0, 2^bits));
  * rank-normalizing arbitrary distributions first is [[graft.ops.Sample
  * .globalOrdinal]]'s job — composing the two handles skewed real columns
  * without this operator needing a second pass of its own.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Statically unrolled — whole-stage-codegen friendly, SQL-replayable
    * (the driver query's DuckDB oracle recomputes it with a range(bits)
    * lateral sum). Inputs outside [0, 2^bits) fail loud rather than
    * silently aliasing distant points onto nearby curve positions. */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zvalue: bits must be in [1,31], got $bits")
    val bound = 1L << bits
    def checked(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= bound, raise_error(concat(
        lit(s"zvalue: $name out of [0, $bound): "),
        coalesce(c.cast("string"), lit("NULL")))).cast("long"))
        .otherwise(c.cast("long"))
    val cx = checked(x, "x")
    val cy = checked(y, "y")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(cx.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(cy.bitwiseAND(lit(1L << i)), i + 1))
    }
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `path` as `files`
    * parquet files: one range exchange on the interleaved key, one
    * in-partition sort, so every file covers a compact rectangle of the
    * (A, B) plane and parquet min/max stats prune on both columns. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    bits: Int, files: Int): Unit = {
    require(files >= 1, s"writeZOrdered: files must be >= 1, got $files")
    df.withColumn("__zv", zvalue(col(colA), col(colB), bits))
      .repartitionByRange(files, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file (A, B) bounding boxes of a written layout — the audit
    * metric: Σ box-area over files is what a min-max pruner effectively
    * scans for a random point/range query. One metadata-cheap pass,
    * grouped by the file each row came from. */
  def boundingBoxes(spark: SparkSession, path: String,
                    colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"),
        count(lit(1)).as("rows"))
}

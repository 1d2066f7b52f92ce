package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generic one-pass column profiler (E35) — the table-agnostic analog of the
  * doc-shaped stats scan (E2), and the missing first step of any validation
  * onboarding: before declaring contracts over an unknown 100 TB table, a
  * user needs per-column counts, null rates, cardinalities, ranges, and
  * moments. The reference validates a FIXED schema at the request boundary
  * (detector_api/app/schemas/drift.py:7-23); this generalizes that to
  * arbitrary tables the way Deequ's column profiler does.
  *
  * Shape at scale: ONE `agg` over every requested column — a single fused
  * pass, map-side partial aggregation, O(columns) scalars to the driver,
  * zero joins, zero extra scans. Cardinality is HLL++ by default
  * (`approx_count_distinct`, mergeable, bounded memory); `exactDistinct =
  * true` switches to `count_distinct` (one expand+shuffle per column — the
  * oracle-gate config, fine at audit scale, NOT the 10^12-row default).
  * Type-dispatched detail: numeric columns get min/max/mean/stddev_pop,
  * strings get lexicographic min/max + length stats, timestamps/dates get
  * formatted range bounds; complex types (array/struct/map) get counts and
  * cardinality only (distinct over canonical hash semantics), every column
  * gets n / null_count / null_rate / distinct.
  */
object Profiler {

  case class ColumnProfile(
      column: String, dtype: String, n: Long,
      null_count: Long, null_rate: Double, distinct_est: Long,
      min_num: Option[Double], max_num: Option[Double],
      mean: Option[Double], stddev: Option[Double],
      min_str: Option[String], max_str: Option[String],
      min_ts: Option[String], max_ts: Option[String],
      avg_length: Option[Double], max_length: Option[Long])

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  private def resolveFields(df: DataFrame, columns: Seq[String]): Seq[StructField] =
    if (columns.isEmpty) df.schema.fields.toSeq
    else columns.map(c => df.schema.fields.find(_.name == c).getOrElse(
      throw new IllegalArgumentException(
        s"profile: no column '$c' (have ${df.columns.mkString(",")})")))

  /** The un-executed single-row fused aggregate behind [[profile]] — exposed
    * so the plan shape (no join; no Expand on the approx path) is
    * spec-assertable. */
  private[graft] def aggPlan(df: DataFrame, columns: Seq[String],
                             exactDistinct: Boolean,
                             groupBy: Option[String] = None): DataFrame = {
    val fields = resolveFields(df, columns)
    // maps are unhashable and unorderable in Spark (no hash(), no distinct,
    // no group-by) — a MapType column profiles to counts only, with the
    // cardinality sentinel -1 rather than an analysis-time crash
    def distinctOf(f: StructField, c: Column): Column = f.dataType match {
      case _: MapType => lit(-1L)
      case _ if exactDistinct => count_distinct(c)
      case _ => approx_count_distinct(c)
    }
    // one fused aggregate: every column contributes its typed slice of
    // aggregates; names are positional (p<i>_<k>) so the single result row
    // unpacks deterministically
    val aggs: Seq[Column] = count(lit(1)).as("rows") +: fields.zipWithIndex.flatMap {
      case (f, i) =>
        val c = col(f.name)
        val base = Seq(
          count(c).as(s"p${i}_n"),
          distinctOf(f, c).as(s"p${i}_d"))
        val detail = f.dataType match {
          case _: NumericType => Seq(
            min(c).cast("double").as(s"p${i}_min"),
            max(c).cast("double").as(s"p${i}_max"),
            avg(c.cast("double")).as(s"p${i}_mean"),
            stddev_pop(c.cast("double")).as(s"p${i}_sd"))
          case StringType => Seq(
            min(c).as(s"p${i}_smin"), max(c).as(s"p${i}_smax"),
            avg(length(c).cast("double")).as(s"p${i}_alen"),
            max(length(c)).cast("long").as(s"p${i}_mlen"))
          case TimestampType | TimestampNTZType | DateType => Seq(
            date_format(min(c), TsFmt).as(s"p${i}_tmin"),
            date_format(max(c), TsFmt).as(s"p${i}_tmax"))
          case _ => Seq.empty
        }
        base ++ detail
    }
    groupBy match {
      case Some(g) => df.groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      case None => df.agg(aggs.head, aggs.tail: _*)
    }
  }

  /** Unpack one aggregate result row into per-column profiles. */
  private def unpack(row: org.apache.spark.sql.Row,
                     fields: Seq[StructField]): Seq[ColumnProfile] = {
    def opt[T](name: String): Option[T] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[T](name))
      else None
    val total = row.getAs[Long]("rows")
    fields.zipWithIndex.map { case (f, i) =>
      val nonNull = row.getAs[Long](s"p${i}_n")
      ColumnProfile(
        column = f.name, dtype = f.dataType.simpleString, n = total,
        null_count = total - nonNull,
        null_rate = if (total == 0) 0.0 else (total - nonNull).toDouble / total,
        distinct_est = row.getAs[Long](s"p${i}_d"),
        min_num = opt[Double](s"p${i}_min"), max_num = opt[Double](s"p${i}_max"),
        mean = opt[Double](s"p${i}_mean"), stddev = opt[Double](s"p${i}_sd"),
        min_str = opt[String](s"p${i}_smin"), max_str = opt[String](s"p${i}_smax"),
        min_ts = opt[String](s"p${i}_tmin"), max_ts = opt[String](s"p${i}_tmax"),
        avg_length = opt[Double](s"p${i}_alen"),
        max_length = opt[Long](s"p${i}_mlen"))
    }
  }

  /** Per-group profiles (the slice-grain profiler): one fused aggregate per
    * group — a single groupBy exchange of O(groups × columns) scalars, then
    * a driver-side pivot to (group, column) profile rows. An AUDIT surface:
    * the driver holds O(groups × columns) rows, so the caller owns the
    * group-cardinality bound (per-source / per-language / per-day grains;
    * for 10^6-slice grains use the relational sliced-drift family, which
    * never collects). */
  def profileBy(df: DataFrame, groupCol: String,
                columns: Seq[String] = Seq.empty,
                exactDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = resolveFields(df,
      if (columns.isEmpty) df.columns.filterNot(_ == groupCol).toSeq else columns)
    require(fields.forall(_.name != groupCol),
      s"profileBy: group column '$groupCol' cannot also be profiled")
    val rows = aggPlan(df, fields.map(_.name), exactDistinct,
      groupBy = Some(groupCol)).collect()
    val profiles = rows.toSeq.flatMap { row =>
      val g = Option(row.get(row.fieldIndex(groupCol))).map(_.toString).orNull
      unpack(row, fields).map(p => (g, p))
    }
    profiles.map { case (g, p) => (g, p.column, p.dtype, p.n, p.null_count,
      p.null_rate, p.distinct_est, p.min_num, p.max_num, p.mean, p.stddev,
      p.min_str, p.max_str, p.min_ts, p.max_ts, p.avg_length, p.max_length)
    }.toDF("group", "column", "dtype", "n", "null_count", "null_rate",
      "distinct_est", "min_num", "max_num", "mean", "stddev", "min_str",
      "max_str", "min_ts", "max_ts", "avg_length", "max_length")
  }

  def profile(df: DataFrame, columns: Seq[String] = Seq.empty,
              exactDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = resolveFields(df, columns)
    val row = aggPlan(df, columns, exactDistinct).head()
    spark.createDataset(unpack(row, fields)).toDF()
  }
}

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
                             exactDistinct: Boolean): DataFrame = {
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
    df.agg(aggs.head, aggs.tail: _*)
  }

  def profile(df: DataFrame, columns: Seq[String] = Seq.empty,
              exactDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = resolveFields(df, columns)
    val row = aggPlan(df, columns, exactDistinct).head()
    def opt[T](name: String): Option[T] =
      if (row.schema.fieldNames.contains(name) && !row.isNullAt(row.fieldIndex(name)))
        Some(row.getAs[T](name))
      else None

    val total = row.getAs[Long]("rows")
    val profiles = fields.zipWithIndex.map { case (f, i) =>
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
    spark.createDataset(profiles).toDF()
  }
}

package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-sigma numeric outlier detection (E21) — the row-grain anomaly
  * companion to the distribution-grain drift checks: where KS/PSI say "this
  * window's distribution moved", this says "these ROWS are implausible
  * under the window's own distribution" (the reference's per-batch feature
  * sanity implicit in its fixed feature scaling, ml/training.py:210-221,
  * made explicit).
  *
  * Shape: ONE aggregation pass computes mean/stddev_pop per group (O(groups)
  * rows — a broadcast, never a shuffle of the data), then one narrow scan
  * flags rows with |v − μ| > k·σ. At 100 TB that is two sequential scans
  * and zero data exchanges; the per-group stats frame is the only thing
  * that moves. NULL and NaN values never flag (data-format concerns —
  * E2's null-rate / ingest quarantine — not outlier ones; NaN is also
  * excluded from μ/σ so one NaN cannot poison its group's stats) and a
  * constant group (σ = 0) flags nothing. The group join is NULL-SAFE
  * (`<=>`): a null group key is
  * a group like any other, so flag(df) ∪ gate(df) partitions df exactly
  * (the quota-sampler's null-group lesson applied). */
object Outliers {

  private def withStats(df: DataFrame, valueCol: String,
                        groupCols: Seq[String]): DataFrame = {
    require(!groupCols.contains(valueCol),
      s"outliers: $valueCol cannot be both the value and a group key")
    // NaN is excluded from the stats like NULL: avg/stddev PROPAGATE NaN,
    // so one NaN row would poison its group's μ/σ and every comparison
    // against them would be false — silently disabling the check for the
    // whole group. NaN rows themselves follow the NULL policy below.
    val raw = col(valueCol).cast("double")
    val v = when(!isnan(raw), raw)
    val aggs = Seq(avg(v).as("__mu"), stddev_pop(v).as("__sd"))
    if (groupCols.isEmpty)
      df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
    else {
      // the stats side derives from df (self-join lineage): rename its
      // group keys so the null-safe condition is unambiguous
      val stats = df.groupBy(groupCols.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
        .select(groupCols.map(c => col(c).as(s"__g_$c")) ++
          Seq(col("__mu"), col("__sd")): _*)
      val cond = groupCols.map(c => col(c) <=> col(s"__g_$c")).reduce(_ && _)
      df.join(broadcast(stats), cond)
    }
  }

  /** Flagged rows: the input columns plus `z_score` (rounded to `zScale`
    * decimals so the value is engine-replayable). Global when `groupCols`
    * is empty, per-group otherwise. */
  def flag(df: DataFrame, valueCol: String, k: Double = 3.0,
           groupCols: Seq[String] = Nil, zScale: Int = 4): DataFrame = {
    require(k > 0, s"outliers: k must be > 0, got $k")
    val v = col(valueCol).cast("double")
    withStats(df, valueCol, groupCols)
      .filter(!isnan(v) && abs(v - col("__mu")) > lit(k) * col("__sd"))
      .select(df.columns.map(df(_)) :+
        round((v - col("__mu")) / col("__sd"), zScale).as("z_score"): _*)
  }

  /** The outlier-free frame: rows within k·σ of their group mean. NULL
    * values are KEPT (they are not outliers; gate on completeness
    * separately) — so gate(df) ∪ flag(df) partitions df exactly. */
  def gate(df: DataFrame, valueCol: String, k: Double = 3.0,
           groupCols: Seq[String] = Nil): DataFrame = {
    require(k > 0, s"outliers: k must be > 0, got $k")
    val v = col(valueCol).cast("double")
    withStats(df, valueCol, groupCols)
      .filter(v.isNull || isnan(v) ||
        !(abs(v - col("__mu")) > lit(k) * col("__sd")))
      .select(df.columns.map(df(_)): _*)
  }
}

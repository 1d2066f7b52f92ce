package graft.checks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Volume (row-count) anomaly detection (E27) — the VOLUMETRIC companion to
  * the distribution-grain drift checks: KS/PSI/MMD say "this window's VALUES
  * moved"; this says "this window's ROW COUNT is implausible against its
  * peers" — the half-empty ingest partition, the doubled-up replay, the
  * upstream job that silently died mid-day. (The reference validates fixed
  * 10k-sample batches, ml/testing.py:61-67, so batch volume is an implicit
  * PRECONDITION there; at snapshot scale it must be an explicit check.)
  *
  * Robust statistics by design: a volume anomaly is exactly the observation
  * that would poison mean/σ, so the fence is median ± k·(1.4826·MAD) — a
  * single wildly-off window cannot move its own threshold the way it moves a
  * mean. All inputs to the statistic are EXACT integer counts, so the result
  * is bit-invariant across partitionings and merge orders (the engine's
  * determinism contract — the reason this check could also ride the flagship
  * fused scan, unlike float-accumulating corrShift).
  *
  * Shape at 100 TB: one map-side-combinable count aggregation → O(windows)
  * rows; the exact median/MAD percentiles run on that tiny counts frame
  * (never on data rows) and broadcast back as 1-row frames. Zero data-row
  * exchanges beyond the count shuffle of slim keys.
  *
  * Policy edges, pinned by spec:
  *  - MAD = 0 (at least half the windows share one count) flags nothing —
  *    the scale estimate is degenerate, same posture as Outliers' σ = 0;
  *    `robust_z` is NULL in that regime so callers can see why.
  *  - every window is EMITTED, flagged or not: a volume report that drops
  *    the normal windows cannot prove coverage.
  */
object VolumeCheck {

  /** MAD → σ consistency constant for the normal distribution. */
  private val MadScale = 1.4826

  /** Per-group row counts with robust anomaly flags. Returns one row per
    * group: groupCols…, `n`, `median_n`, `mad_n`, `robust_z` (rounded to
    * `zScale` decimals; NULL when MAD = 0), `is_anomaly`.
    *
    * ONE map-side-combinable count aggregation over the data rows: the
    * O(groups) counts frame is persisted, the median/MAD fences are driver
    * arithmetic over its collected counts ([[medianOf]] — the same
    * interpolated-median rule as SQL `percentile(x, 0.5)`), and the result
    * (also O(groups)) is materialized eagerly so the persist releases
    * deterministically before returning. The earlier formulation derived
    * med/MAD/fences from the UNPERSISTED counts frame — three full scans
    * of `df` for one report. */
  def anomaly(df: DataFrame, groupCols: Seq[String], k: Double = 3.5,
              zScale: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "volume: at least one group column required")
    require(groupCols.forall(df.columns.contains),
      s"volume: group columns ${groupCols.mkString(",")} must exist in ${df.columns.mkString(",")}")
    require(k > 0, s"volume: k must be > 0, got $k")
    val counts = df.groupBy(groupCols.map(col): _*).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ns = counts.select(col("n")).collect().map(_.getLong(0).toDouble)
      val med = if (ns.isEmpty) 0.0 else medianOf(ns)
      val mad = if (ns.isEmpty) 0.0 else medianOf(ns.map(v => math.abs(v - med)))
      val dev = col("n") - lit(med)
      val scale = lit(MadScale * mad)
      val out = counts.select(
        groupCols.map(col) ++ Seq(
          col("n"),
          round(lit(med), zScale).as("median_n"),
          round(lit(mad), zScale).as("mad_n"),
          round(when(lit(mad) > 0, dev / scale), zScale).as("robust_z"),
          (lit(mad) > 0 && abs(dev) > lit(k) * scale).as("is_anomaly")): _*)
      val rows = out.collect() // O(groups) — bounded by construction
      df.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally counts.unpersist(blocking = false)
  }

  /** Interpolated (continuous) median — same rule as Spark/DuckDB
    * `percentile(x, 0.5)`: odd n takes the middle rank, even n the mean of
    * the two middle ranks. Driver arithmetic over O(windows) values. */
  private def medianOf(xs: Array[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Per-PARTITION volume verdicts for the flagship validation pass (E27 as
    * a check family): the per-part doc counts already ride the fused stats
    * scan, so this is pure driver arithmetic over O(parts) exact integers —
    * zero extra jobs, bit-invariant across partitionings and merge orders
    * (the engine's determinism contract).
    *
    * The fence is RUN-SCOPED: median/MAD over exactly the partitions this
    * run validated. For the flagship full pass that window is the whole
    * snapshot — the right peer group. Resumable runs that batch partitions
    * get per-BATCH fences (each batch is its own peer group); callers
    * wanting one table-grain fence across a resumed chain recompute from
    * the persisted stats counts — see ValidationRun.runIncremental, which
    * does exactly that instead of carrying stale volume rows forward.
    *
    * Verdict shape: distance = |robust_z| (0 in the MAD=0 degenerate
    * regime, where nothing can flag), p_value = 1 (constraint-style, like
    * uniqueness/referential), passed = not anomalous. `robust_z` is
    * OMITTED from metrics when MAD = 0 — a NaN metric would break the
    * bit-identity comparisons the parallelism/resume specs rely on
    * (NaN != NaN), and the distributed twin emits NULL there for the same
    * "visible degenerate regime" reason. */
  def verdictsFromCounts(runId: String, alpha: Double, counts: Map[Int, Long],
                         snapshotId: Long, k: Double = 3.5): Seq[Verdict] = {
    require(k > 0, s"volume: k must be > 0, got $k")
    if (counts.isEmpty) return Seq.empty
    val arr = counts.values.map(_.toDouble).toArray
    val med = medianOf(arr)
    val mad = medianOf(arr.map(v => math.abs(v - med)))
    counts.keys.toSeq.sorted.map { p =>
      val n = counts(p).toDouble
      val z = if (mad > 0) (n - med) / (MadScale * mad) else 0.0
      val anomalous = mad > 0 && math.abs(n - med) > k * MadScale * mad
      val base = Map("count" -> n, "median_n" -> med, "mad_n" -> mad,
        "k" -> k, "n_windows" -> counts.size.toDouble)
      Verdict.now(runId, p, "volume", alpha, math.abs(z), 1.0,
        Some(!anomalous),
        if (mad > 0) base + ("robust_z" -> z) else base, snapshotId)
    }
  }

  /** Convenience: anomaly over event-time windows truncated to `unit`
    * ("hour", "day", …) of `tsCol`; the window column is emitted as `w`.
    * NULL timestamps form their own window (a burst of null-ts rows is a
    * volume signal, not something to silently drop). */
  def anomalyByTime(df: DataFrame, tsCol: String, unit: String = "hour",
                    k: Double = 3.5, zScale: Int = 6): DataFrame =
    anomaly(df.withColumn("w", date_trunc(unit, col(tsCol))), Seq("w"),
      k = k, zScale = zScale)
}

package graft.checks

/** Verdict row — one per (run, partition, check). Field shape mirrors the
  * reference's `DistanceBasedResponse` {alpha, datetime, is_drift, p_value,
  * distance} (reference detector_api/app/schemas/drift.py:26-51, built at
  * detector_api/app/detector.py:62-69), extended with the validation-engine
  * fields (passed, metrics, lineage). */
case class Verdict(
    run_id: String,
    part: Int,
    check_id: String,
    alpha: Double,
    datetime: String, // UTC "dd/MM/yyyy HH:mm:ss.SSSSSS" — reference detector.py:64-66
    ts: java.sql.Timestamp,
    distance: Double,
    p_value: Double,
    is_drift: Boolean, // p_value <= alpha — reference detector.py:68
    passed: Boolean, // constraint: no violations; drift: !is_drift
    metrics: Map[String, Double],
    snapshot_id: Long,
    // optional echo of the (bounded) feature batch the check consumed —
    // parity with the reference's `return_input_values` response field
    // (detector_api/app/schemas/drift.py:13, app/api.py:41-42). None unless
    // RunConfig.echoInputValues is set; the echoed batch is the SAMPLED
    // window, never full-table rows.
    input_values: Option[Seq[Seq[Double]]] = None)

/** One row per violating document (duplicates, dangling refs, bad span order,
  * null kinds). */
case class Violation(
    run_id: String,
    part: Int,
    check_id: String,
    doc_id: String,
    detail: String)

/** Fitted reference-window state — the analog of the reference's pickled
  * frouros detector (fit at ml/training.py:116-148, loaded at
  * detector_api/app/detector.py:38-42). Holds everything `compare` needs:
  * the RBF σ (median heuristic), a bounded reference feature sample, the
  * offset-distribution KLL sketch, and the span-kind histogram. */
case class RefState(
    sigma: Double,
    refSample: Array[Array[Double]],
    kllBytes: Array[Byte],
    kindHist: Map[String, Long],
    nDocs: Long,
    nSpans: Long,
    snapshotId: Long,
    // EXACT offset-CDF evaluation grid (sorted distinct reference quantile
    // values at a ~200-point grid, Fit.exactOffsetEdges) + the exact
    // cumulative count ≤ each edge. When present, the KS/PSI checks compare
    // exact integer-sum CDFs at these fixed edges instead of KLL sketch
    // ranks — bit-identical verdicts at ANY parallelism/merge order (the
    // engine's determinism contract). Empty = legacy KLL fallback (offset
    // domains too wide for the exact fit histogram).
    offsetEdges: Array[Double] = Array.empty,
    refEdgeCum: Array[Long] = Array.empty)

object Verdict {
  val TimestampFormat = "dd/MM/yyyy HH:mm:ss.SSSSSS"

  /** Build a verdict with the current UTC wall-clock, reference-format string. */
  def now(runId: String, part: Int, checkId: String, alpha: Double,
          distance: Double, pValue: Double, passedConstraint: Option[Boolean],
          metrics: Map[String, Double], snapshotId: Long,
          inputValues: Option[Seq[Seq[Double]]] = None): Verdict = {
    val nowInst = java.time.Instant.now()
    val fmt = java.time.format.DateTimeFormatter.ofPattern(TimestampFormat)
      .withZone(java.time.ZoneOffset.UTC)
    val isDrift = pValue <= alpha
    Verdict(runId, part, checkId, alpha, fmt.format(nowInst),
      java.sql.Timestamp.from(nowInst), distance, pValue, isDrift,
      passedConstraint.getOrElse(!isDrift), metrics, snapshotId, inputValues)
  }
}

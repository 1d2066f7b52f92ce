package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-expressible engine operators run against the driver's TPC-H-ish
  * testdata, each with a DuckDB oracle (SURVEY.md §5.7 / FIXTURES.md §5).
  * Every aggregate / computed column is aliased identically to the oracle SQL
  * (the driver's compare hashes values under sorted column names).
  *
  * These mirror the engine checks: E2/E3 stats, E5 uniqueness, E6 referential,
  * E7 KS, E8 chi-squared contingency, E9 PSI, E15 top-k.
  */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** E2/E3: one-pass column stats on lineitem. */
  def statsLineitem(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("cnt"),
      count($"l_quantity").as("cnt_quantity"),
      countDistinct($"l_partkey").as("distinct_partkey"),
      countDistinct($"l_suppkey").as("distinct_suppkey"),
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      round(sum($"l_quantity"), 4).as("sum_qty"))
  }

  /** E5: uniqueness totals via the single-shuffle per-key count — the
    * engine's measured default since round 2 (map-side partial aggregation
    * already bounds any hot key's reducer input for combinable aggregates;
    * the explicit salt stage this query carried through round 5 bought a
    * second full exchange and nothing else — r06 A/B at 150K keys: 3
    * stacked aggregations → 2, identical totals). The salted two-stage
    * pattern itself remains first-class in ConstraintChecks.uniqueness
    * (salts > 0, E13) and is exercised by `skew_join_hot`. */
  def uniqueOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perKey = t(s, dir, "orders")
      .groupBy($"o_orderkey").agg(count(lit(1)).as("n"))
    perKey.agg(
      count(lit(1)).as("distinct_keys"),
      sum($"n").as("total"),
      sum(when($"n" > 1, 1L).otherwise(0L)).as("dup_keys"))
  }

  /** Composite-key uniqueness through the FLAGSHIP implementation
    * (ConstraintChecks.uniqueness with caller-chosen keyCols — no more
    * inline re-derivation for non-doc_id keys): business key
    * (o_custkey, o_orderdate) over orders partitioned by order year.
    * Customers placing two orders on one date are genuine dup keys, so
    * the fixed-width hash-pair shuffle, min-part dup attribution, and
    * per-part stat rollup are all exercised and DuckDB-replayed. */
  def uniqueComposite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders")
      .withColumn("part", (year($"o_orderdate") - 1992).cast("int"))
    val (_, stats) = graft.checks.ConstraintChecks.uniqueness(
      orders, runId = "driver", keyCols = Seq("o_custkey", "o_orderdate"))
    stats.toSeq.sortBy(_._1)
      .map { case (p, u) => (p, u.dupKeys, u.distinctKeys, u.totalDocs) }
      .toDF("part", "dup_keys", "distinct_keys", "total_docs")
      .orderBy($"part")
  }

  /** E3 HLL path, oracle-GATED: the merged HLL sketch estimate for
    * o_custkey must land within 2% of the exact distinct count — the query
    * emits the exact count plus the accuracy verdict as a boolean, so the
    * DuckDB oracle (exact count + literal TRUE) hash-fails if the sketch
    * path ever drifts outside the bound. Spark's HLL++ at the default
    * relativeSD=0.05 measures ≪1% here; the 2% gate leaves margin while
    * still catching any real sketch breakage. */
  def hllOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders").agg(
        countDistinct($"o_custkey").as("exact_distinct"),
        hll_sketch_estimate(hll_sketch_agg($"o_custkey")).as("hll"))
      .select($"exact_distinct",
        (abs($"hll" - $"exact_distinct") / $"exact_distinct" < 0.02).as("hll_within_2pct"))
  }

  /** E6: referential integrity orders.o_custkey → customer.c_custkey via
    * broadcast LEFT ANTI join (violations counted). */
  def refOrdersCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dangling = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer").select($"c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
    dangling.agg(count(lit(1)).as("dangling_orders"))
  }

  /** E6 PROBE-SIDE layout, same oracle shape as [[refOrdersCustomer]]: the
    * referenced key set broadcasts into one narrow catalog scan (present
    * set, bounded) and back onto the probe side — the catalog never
    * shuffles. The path huge-catalog referential checks take
    * (ConstraintChecks.referentialProbeSide); here hash-gated on TPC-H. */
  def refProbeSide(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = t(s, dir, "orders").select($"o_custkey")
    val refSet = orders.distinct()
    val present = t(s, dir, "customer").select($"c_custkey")
      .join(broadcast(refSet), $"c_custkey" === $"o_custkey", "left_semi")
    orders
      .join(broadcast(present), $"o_custkey" === $"c_custkey", "left_anti")
      .agg(count(lit(1)).as("dangling_orders"))
  }

  /** E8: chi-squared contingency table — l_returnflag counts per shipdate
    * year (the categorical-drift windows). */
  def chi2ReturnflagYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy(year($"l_shipdate").as("yr"), $"l_returnflag".as("flag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy($"yr", $"flag")
  }

  /** E9 bucket counts: fixed-width buckets of l_quantity. */
  def psiQuantityBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .select(least(floor($"l_quantity" / 5.0), lit(9.0)).cast("int").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
      .orderBy($"bucket")
  }

  /** E9: full PSI of the l_quantity distribution between two l_shipdate year
    * windows, computed end-to-end in the engine (proportions from exact
    * bucket counts). Single-row result, rounded for cross-engine FP parity. */
  def psiQuantityYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // totals ride an unbounded window over the 10 bucket rows instead of a
    // separate aggregate branch cross-joined back (one lineitem scan, see
    // ksQuantityYears) — identical long sums, identical doubles
    val li = t(s, dir, "lineitem")
      .select(least(floor($"l_quantity" / 5.0), lit(9.0)).cast("int").as("bucket"),
        (year($"l_shipdate") >= 1996).as("is_prod"))
    val counts = li.groupBy($"bucket")
      .agg(sum(when(!$"is_prod", 1L).otherwise(0L)).as("c_ref"),
        sum(when($"is_prod", 1L).otherwise(0L)).as("c_prod"))
    val wAll = Window.orderBy($"bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("t_ref", sum($"c_ref").over(wAll))
      .withColumn("t_prod", sum($"c_prod").over(wAll))
      .select((greatest($"c_ref" / $"t_ref", lit(1e-6))).as("p"),
        (greatest($"c_prod" / $"t_prod", lit(1e-6))).as("q"))
      .agg(round(sum(($"q" - $"p") * log($"q" / $"p")), 6).as("psi"))
  }

  /** E7: two-sample KS D-statistic of l_quantity between two shipdate-year
    * windows, from exact empirical CDFs via window cumulative sums.
    *
    * r06: the grand totals ride the SAME window frame (unbounded sum over
    * the distinct-value rows) instead of a separate aggregate branch
    * cross-joined back — the r05 shape planned TWO full lineitem scans
    * (plans/r06/ks_quantity_years_before.txt, Scan ops 1 and 10); this is
    * one scan, one exchange, one Window node. Totals are exact long sums
    * either way, so every double divides identically. */
  def ksQuantityYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_quantity".as("q"), (year($"l_shipdate") >= 1996).as("is_prod"))
    val counts = li.groupBy($"q")
      .agg(sum(when(!$"is_prod", 1L).otherwise(0L)).as("c_ref"),
        sum(when($"is_prod", 1L).otherwise(0L)).as("c_prod"))
    val w = Window.orderBy($"q").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy($"q")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum_ref", sum($"c_ref").over(w))
      .withColumn("cum_prod", sum($"c_prod").over(w))
      .withColumn("t_ref", sum($"c_ref").over(wAll))
      .withColumn("t_prod", sum($"c_prod").over(wAll))
      .select(abs($"cum_ref" / $"t_ref" - $"cum_prod" / $"t_prod").as("d"))
      .agg(round(max($"d"), 6).as("ks_d"))
  }

  /** E22: Pearson-correlation shift of (l_quantity, l_extendedprice)
    * across shipdate years against the 1995 reference year — the joint
    * statistic the per-column marginal tests miss. */
  def corrShiftYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.checks.DriftChecks.corrShift(
        t(s, dir, "lineitem").withColumn("yr", year($"l_shipdate")),
        "l_quantity", "l_extendedprice", "yr",
        refWindow = 1995, threshold = 0.002)
      .orderBy($"yr")
  }

  /** Wasserstein-1 distance of l_quantity between two shipdate-year windows
    * — the magnitude-sensitive drift distance (DriftChecks.emd) replayed on
    * TPC-H columns from exact empirical CDFs: Σ |ΔCDF| × value gap via
    * window cumulative sums + lead. */
  def emdQuantityYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_quantity".as("q"), (year($"l_shipdate") >= 1996).as("is_prod"))
    val counts = li.groupBy($"q")
      .agg(sum(when(!$"is_prod", 1L).otherwise(0L)).as("c_ref"),
        sum(when($"is_prod", 1L).otherwise(0L)).as("c_prod"))
    val w = Window.orderBy($"q").rowsBetween(Window.unboundedPreceding, 0)
    val wl = Window.orderBy($"q")
    // totals via the unbounded frame of the same Window spec (one lineitem
    // scan instead of the cross-joined aggregate branch; see ksQuantityYears)
    val wAll = Window.orderBy($"q")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("cum_ref", sum($"c_ref").over(w))
      .withColumn("cum_prod", sum($"c_prod").over(w))
      .withColumn("q_next", lead($"q", 1).over(wl))
      .withColumn("t_ref", sum($"c_ref").over(wAll))
      .withColumn("t_prod", sum($"c_prod").over(wAll))
      .filter($"q_next".isNotNull)
      .select((abs($"cum_ref" / $"t_ref" - $"cum_prod" / $"t_prod")
        * ($"q_next" - $"q")).as("area"))
      .agg(round(sum($"area"), 6).as("emd"))
  }

  /** Jensen–Shannon divergence (base 2) of l_returnflag between two
    * shipdate-year windows — the bounded categorical drift size
    * (DriftChecks.jsd) replayed on TPC-H columns from exact counts. */
  def jsdReturnflagYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_returnflag".as("f"), (year($"l_shipdate") >= 1996).as("is_prod"))
    val counts = li.groupBy($"f")
      .agg(sum(when(!$"is_prod", 1L).otherwise(0L)).as("c_ref"),
        sum(when($"is_prod", 1L).otherwise(0L)).as("c_prod"))
    val tot = counts.agg(sum($"c_ref").as("t_ref"), sum($"c_prod").as("t_prod"))
    counts.crossJoin(tot)
      .select(($"c_ref" / $"t_ref").as("p"), ($"c_prod" / $"t_prod").as("q"))
      .withColumn("m", ($"p" + $"q") / 2)
      .select(
        (when($"p" > 0, $"p" * log($"p" / $"m") / log(lit(2.0))).otherwise(0.0) / 2 +
          when($"q" > 0, $"q" * log($"q" / $"m") / log(lit(2.0))).otherwise(0.0) / 2).as("term"))
      .agg(round(sum($"term"), 6).as("jsd"))
  }

  /** E4 t-digest path, oracle-GATED like [[hllOrders]]: the merged t-digest
    * of l_quantity must (a) report n/min/max EXACTLY — the query emits them
    * FROM the digest, the oracle recomputes them from the raw column, so any
    * weight/extreme drift hash-fails — and (b) place its p50/p95 estimates
    * inside a ±2% exact-rank window, emitted as booleans the oracle pins to
    * TRUE. The rank window is computed by a second exact scan (counts below
    * / at-or-below the estimate), so the gate is tie-robust: l_quantity has
    * ~2% of mass per distinct value and a rank-vs-value check would be
    * ambiguous mid-jump. Exercises update → partial serialize → shuffle →
    * merge → eval end to end on the driver path. */
  def tdigestQuantity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sketch.{TDigestAgg, TDigestOps}
    val li = t(s, dir, "lineitem")
    val bytes = li.agg(TDigestAgg.tdigest($"l_quantity").as("td"))
      .head.getAs[Array[Byte]](0)
    val Array(q50, q95) = TDigestOps.quantiles(bytes, Array(0.5, 0.95))
    def inBound(est: Double, rank: Double, tol: Double): Column = {
      val nn = count(lit(1)).cast("double")
      (sum(when($"l_quantity" < est, 1L).otherwise(0L)).cast("double") / nn
        <= rank + tol) &&
        (sum(when($"l_quantity" <= est, 1L).otherwise(0L)).cast("double") / nn
          >= rank - tol)
    }
    // tolerance 5 % of rank, NOT the digest's nominal accuracy: l_quantity
    // is DISCRETE (integers 1..50, ~2 % of mass per value), so an estimate
    // interpolated anywhere within one value's mass span already moves the
    // strict/non-strict ranks by ±2 % — at tol 0.02 the check was a knife
    // edge that flaked with merge order (t-digest centroid layout is
    // order-dependent; observed once at sf0.1). 5 % = 2.5 value masses
    // still hash-fails any genuinely broken merge (those are off by far
    // more) without gating on interpolation luck.
    li.agg(
      inBound(q50, 0.5, 0.05).as("p50_in_5pct"),
      inBound(q95, 0.95, 0.05).as("p95_in_5pct"))
      .select(
        lit(TDigestOps.n(bytes)).as("n"),
        lit(TDigestOps.min(bytes)).as("min_qty"),
        lit(TDigestOps.max(bytes)).as("max_qty"),
        $"p50_in_5pct", $"p95_in_5pct")
  }

  /** E3 theta-sketch SET OPERATIONS, oracle-GATED in exact mode: distinct
    * o_custkey sketches for two order years, combined driver-side via
    * union / intersection / A-not-B ([[graft.sketch.ThetaOps]]). The
    * per-year distinct counts here sit far below the 4096 nominal entries,
    * so every sketch — and every set-op result over them — is in EXACT mode
    * by construction, and the emitted counts must hash-match DuckDB's
    * INTERSECT/EXCEPT recomputation exactly. This is the cross-snapshot
    * primitive HLL can't express (inclusion–exclusion over HLL estimates
    * compounds error); estimation-mode error bounds are spec-covered in
    * ThetaSketchAggSpec. */
  def thetaCustomerOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sketch.{ThetaOps, ThetaSketchAgg}
    val o = t(s, dir, "orders")
      .select($"o_custkey", year($"o_orderdate").as("y"))
    // ONE grouped scan builds both sketches (partial->shuffle->final per
    // year group), not one job per year — the scale shape this file models
    // nominal 2^16: the per-year distincts are ~1.2k at sf0.01 and ~11.7k
    // at sf0.1, so the sketches stay in EXACT mode at every oracle scale
    // (the default 4096 tipped into estimation at sf0.1 — an ~1.7 % error
    // the exact-count oracle rightly rejects); estimation behavior itself
    // is spec-owned (ThetaSpec), the oracle owns the exact regime
    val nominal = 1 << 16
    val byYear = o.filter($"y".isin(1995, 1996))
      .groupBy($"y").agg(ThetaSketchAgg.thetaSketch($"o_custkey", nominal).as("sk"))
      .collect().map(r => r.getAs[Int]("y") -> r.getAs[Array[Byte]]("sk")).toMap
    // a year with no orders yields no group — count it as the empty set,
    // not a bare map-lookup crash
    val a = byYear.getOrElse(1995, ThetaOps.empty)
    val b = byYear.getOrElse(1996, ThetaOps.empty)
    o.sparkSession.range(1).select(
      lit(ThetaOps.estimateLong(a)).as("n_1995"),
      lit(ThetaOps.estimateLong(b)).as("n_1996"),
      lit(ThetaOps.estimateLong(ThetaOps.intersect(a, b))).as("n_both"),
      lit(ThetaOps.estimateLong(ThetaOps.union(a, b, nominal))).as("n_either"),
      lit(ThetaOps.estimateLong(ThetaOps.aNotB(a, b))).as("n_only_1995"))
  }

  /** E13 detection, oracle-gated in the ALWAYS-exact regime: the
    * frequent-items sketch over l_returnflag (3 distinct keys — no purge at
    * any SF, every retained count exact) must reproduce the exact per-key
    * counts above a 20% mass threshold. The estimation-mode guarantees
    * (no false negatives under purge) are spec-tested (SkewSpec). */
  def freqHotKeys(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val hot = graft.ops.Skew.heavyKeys(li, "l_returnflag", minFrac = 0.2, maxMapSize = 64)
    s.createDataFrame(hot.map(h => (h.key, h.estimate)))
      .toDF("k", "cnt").orderBy($"k")
  }

  /** E13 remedy, end-to-end DuckDB-oracled: a quarter of orders remapped
    * onto one hot customer key, the hot key DETECTED by the sketch pass
    * (gated by the literal TRUE column) and the differentiated salted join
    * applied — the aggregate over the join must equal the plain-join replay
    * (salting must never change results, only shuffle placement). */
  def skewJoinHot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o2 = t(s, dir, "orders").select(
      when(pmod($"o_orderkey", lit(4)) === 0, lit(1L)).otherwise($"o_custkey").as("k"),
      $"o_totalprice")
    val cust = t(s, dir, "customer").select($"c_custkey".as("k"), $"c_mktsegment")
    val hot = graft.ops.Skew.heavyKeys(o2, "k", minFrac = 0.1, maxMapSize = 1024)
    val joined = graft.ops.Skew.saltedJoinHot(o2, cust, "k", hot.map(_.key), salts = 8)
    joined.groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 2).as("sum_price"))
      .withColumn("hot_detected", lit(hot.exists(_.key == "1")))
      .orderBy($"c_mktsegment")
  }

  /** E15: top-k with a deterministic tiebreak. */
  def topkOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
  }

  /** Streaming-shaped batch aggregation: tumbling 1-hour windows over events
    * (the batch-equivalent oracle of ops.StreamingOps.hourlyEventCounts). */
  def eventsHourlyAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 4).as("sum_v"))
      .orderBy($"hr", $"event_type")
  }

  /** E37 sliced chi² drift: per (ship-year window × linestatus slice), the
    * returnflag-mix homogeneity statistic vs the 1995 reference window —
    * computed fully relationally (the any-scale tier). The 1995 rows are
    * the self-comparison control (stat exactly 0). */
  def chi2SlicedYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select(year($"l_shipdate").as("yr"), $"l_linestatus".as("status"),
        $"l_returnflag".as("flag"))
    val (rel, release) = graft.checks.DriftChecks.chi2Sliced(
      li, "yr", "status", "flag", 1995)
    val out = rel.select($"yr", $"status", $"n_ref", $"n_prod", $"dof",
        round($"stat", 6).as("stat"))
      .orderBy($"yr", $"status")
    // materialize, then release the managed counts persist deterministically
    val rows = out.collect()
    release()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** E38 sliced KS drift: per (ship-year window × linestatus slice), the
    * exact empirical-CDF KS distance of l_quantity vs the 1995 reference
    * window — the numeric twin of chi2_sliced_years, same relational tier. */
  def ksSlicedYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select(year($"l_shipdate").as("yr"), $"l_linestatus".as("status"),
        $"l_quantity".cast("int").as("q"))
    val (rel, release) = graft.checks.DriftChecks.ksSliced(
      li, "yr", "status", "q", 1995)
    val out = rel.select($"yr", $"status", $"n_ref", $"n_prod",
        round($"ks_d", 6).as("ks_d"))
      .orderBy($"yr", $"status")
    val rows = out.collect()
    release()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** E41 sliced PSI: per (ship-year window × linestatus slice), the decile
    * population-stability index of l_quantity vs the 1995 reference window
    * — the effect-size member of the relational sliced family. */
  def psiSlicedYears(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select(year($"l_shipdate").as("yr"), $"l_linestatus".as("status"),
        $"l_quantity".cast("int").as("q"))
    val (rel, release) = graft.checks.DriftChecks.psiSliced(
      li, "yr", "status", "q", 1995)
    val out = rel.select($"yr", $"status", $"n_ref", $"n_prod",
        round($"psi", 6).as("psi"))
      .orderBy($"yr", $"status")
    val rows = out.collect()
    release()
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** Generic one-pass column profiler (E35) over orders at the exact-
    * distinct oracle-gate config; floats rounded so the two engines'
    * summation orders cannot differ at the hash grain. */
  def tableProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.checks.Profiler.profile(t(s, dir, "orders"), exactDistinct = true)
      .select($"column", $"n", $"null_count",
        round($"null_rate", 6).as("null_rate"), $"distinct_est",
        round($"min_num", 6).as("min_num"), round($"max_num", 6).as("max_num"),
        round($"mean", 4).as("mean"), round($"stddev", 4).as("stddev"),
        $"min_str", $"max_str", $"min_ts", $"max_ts",
        round($"avg_length", 4).as("avg_length"), $"max_length")
      .orderBy($"column")
  }

  /** Per-group profiler (E35 slice grain) over orders by o_orderstatus —
    * two numeric columns + one string column at the exact-distinct gate. */
  def tableProfileBy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.checks.Profiler.profileBy(t(s, dir, "orders"), "o_orderstatus",
        columns = Seq("o_custkey", "o_totalprice", "o_orderpriority"),
        exactDistinct = true)
      .select($"group", $"column", $"n", $"null_count",
        round($"null_rate", 6).as("null_rate"), $"distinct_est",
        round($"min_num", 6).as("min_num"), round($"max_num", 6).as("max_num"),
        round($"mean", 4).as("mean"), round($"stddev", 4).as("stddev"),
        $"min_str", $"max_str",
        round($"avg_length", 4).as("avg_length"), $"max_length")
      .orderBy($"group", $"column")
  }

  val oracleSql: Map[String, String] = Map(
    "psi_sliced_years" ->
      """WITH counts AS (
           SELECT year(l_shipdate) AS w, l_linestatus AS s,
             CAST(l_quantity AS INT) AS v, count(*) AS o
           FROM lineitem GROUP BY 1, 2, 3),
         wins AS (SELECT DISTINCT w, s FROM counts),
         universe AS (SELECT DISTINCT s, v FROM counts),
         ref AS (SELECT s, v, o AS r FROM counts WHERE w = 1995),
         refgrid AS (
           SELECT u.s, u.v,
             least(greatest(
               (sum(coalesce(rf.r, 0)) OVER (PARTITION BY u.s ORDER BY u.v
                  ROWS UNBOUNDED PRECEDING) * 10 - 1)
               // (sum(coalesce(rf.r, 0)) OVER (PARTITION BY u.s)) + 1,
               1), 10) AS bucket
           FROM universe u LEFT JOIN ref rf ON rf.s = u.s AND rf.v = u.v),
         grid AS (
           SELECT wn.w, wn.s, u.v, coalesce(c.o, 0) AS o, coalesce(rf.r, 0) AS r,
             rg.bucket
           FROM wins wn JOIN universe u ON wn.s = u.s
           LEFT JOIN counts c ON c.w = wn.w AND c.s = wn.s AND c.v = u.v
           LEFT JOIN ref rf ON rf.s = wn.s AND rf.v = u.v
           JOIN refgrid rg ON rg.s = wn.s AND rg.v = u.v),
         byb AS (
           SELECT w, s, bucket, sum(r) AS rb, sum(o) AS ob
           FROM grid GROUP BY 1, 2, 3),
         tot AS (SELECT w, s, sum(rb) AS n_ref, sum(ob) AS n_prod
                 FROM byb GROUP BY 1, 2),
         terms AS (
           SELECT b.w, b.s, t.n_ref, t.n_prod,
             greatest(b.rb * 1.0 / t.n_ref, 1e-6) AS p,
             greatest(b.ob * 1.0 / t.n_prod, 1e-6) AS q
           FROM byb b JOIN tot t ON b.w = t.w AND b.s = t.s
           WHERE t.n_ref > 0 AND t.n_prod > 0)
         SELECT w AS yr, s AS status,
           CAST(min(n_ref) AS BIGINT) AS n_ref,
           CAST(min(n_prod) AS BIGINT) AS n_prod,
           round(sum((p - q) * ln(p / q)), 6) AS psi
         FROM terms GROUP BY 1, 2 ORDER BY 1, 2""",
    "table_profile_by" -> {
      def num(c: String) =
        s"""SELECT o_orderstatus AS "group", '$c' AS "column", count(*) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            round((count(*) - count($c)) * 1.0 / count(*), 6) AS null_rate,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_est,
            round(CAST(min($c) AS DOUBLE), 6) AS min_num,
            round(CAST(max($c) AS DOUBLE), 6) AS max_num,
            round(avg(CAST($c AS DOUBLE)), 4) AS mean,
            round(stddev_pop(CAST($c AS DOUBLE)), 4) AS stddev,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
            CAST(NULL AS DOUBLE) AS avg_length, CAST(NULL AS BIGINT) AS max_length
            FROM orders GROUP BY 1"""
      def str(c: String) =
        s"""SELECT o_orderstatus AS "group", '$c' AS "column", count(*) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            round((count(*) - count($c)) * 1.0 / count(*), 6) AS null_rate,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_est,
            CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
            CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev,
            min($c) AS min_str, max($c) AS max_str,
            round(avg(length($c) * 1.0), 4) AS avg_length,
            CAST(max(length($c)) AS BIGINT) AS max_length
            FROM orders GROUP BY 1"""
      Seq(num("o_custkey"), num("o_totalprice"), str("o_orderpriority"))
        .mkString("", " UNION ALL ", """ ORDER BY "group", "column"""")
    },
    "ks_sliced_years" ->
      """WITH counts AS (
           SELECT year(l_shipdate) AS w, l_linestatus AS s,
             CAST(l_quantity AS INT) AS v, count(*) AS o
           FROM lineitem GROUP BY 1, 2, 3),
         wins AS (SELECT DISTINCT w, s FROM counts),
         universe AS (SELECT DISTINCT s, v FROM counts),
         ref AS (SELECT s, v, o AS r FROM counts WHERE w = 1995),
         grid AS (
           SELECT wn.w, wn.s, u.v, coalesce(c.o, 0) AS o, coalesce(rf.r, 0) AS r
           FROM wins wn JOIN universe u ON wn.s = u.s
           LEFT JOIN counts c ON c.w = wn.w AND c.s = wn.s AND c.v = u.v
           LEFT JOIN ref rf ON rf.s = wn.s AND rf.v = u.v),
         cum AS (
           SELECT w, s, v,
             sum(o) OVER (PARTITION BY w, s ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum_o,
             sum(r) OVER (PARTITION BY w, s ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS cum_r,
             sum(o) OVER (PARTITION BY w, s) AS n_prod,
             sum(r) OVER (PARTITION BY w, s) AS n_ref
           FROM grid)
         SELECT w AS yr, s AS status,
           CAST(min(n_ref) AS BIGINT) AS n_ref,
           CAST(min(n_prod) AS BIGINT) AS n_prod,
           round(max(abs(cum_r * 1.0 / n_ref - cum_o * 1.0 / n_prod)), 6) AS ks_d
         FROM cum WHERE n_ref > 0 AND n_prod > 0
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "chi2_sliced_years" ->
      """WITH counts AS (
           SELECT year(l_shipdate) AS w, l_linestatus AS s, l_returnflag AS k,
             count(*) AS o
           FROM lineitem GROUP BY 1, 2, 3),
         wins AS (SELECT DISTINCT w, s FROM counts),
         universe AS (SELECT DISTINCT s, k FROM counts),
         ref AS (SELECT s, k, o AS r FROM counts WHERE w = 1995),
         grid AS (
           SELECT wn.w, wn.s, u.k, coalesce(c.o, 0) AS o, coalesce(rf.r, 0) AS r
           FROM wins wn JOIN universe u ON wn.s = u.s
           LEFT JOIN counts c ON c.w = wn.w AND c.s = wn.s AND c.k = u.k
           LEFT JOIN ref rf ON rf.s = wn.s AND rf.k = u.k),
         tot AS (
           SELECT w, s, sum(r) AS n_ref, sum(o) AS n_prod,
             sum(CASE WHEN r + o > 0 THEN 1 ELSE 0 END) AS kept
           FROM grid GROUP BY 1, 2),
         terms AS (
           SELECT g.w, g.s, t.n_ref, t.n_prod, t.kept,
             (g.r + g.o) * 1.0 / (t.n_ref + t.n_prod) AS pooled,
             g.r, g.o
           FROM grid g JOIN tot t ON g.w = t.w AND g.s = t.s
           WHERE g.r + g.o > 0 AND t.kept >= 2 AND t.n_ref > 0 AND t.n_prod > 0)
         SELECT w AS yr, s AS status,
           CAST(min(n_ref) AS BIGINT) AS n_ref,
           CAST(min(n_prod) AS BIGINT) AS n_prod,
           CAST(min(kept) - 1 AS INT) AS dof,
           round(sum(
             (r - pooled * n_ref) * (r - pooled * n_ref) / (pooled * n_ref)
             + (o - pooled * n_prod) * (o - pooled * n_prod) / (pooled * n_prod)), 6)
             AS stat
         FROM terms GROUP BY 1, 2 ORDER BY 1, 2""",
    "table_profile" -> {
      def num(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            round((count(*) - count($c)) * 1.0 / count(*), 6) AS null_rate,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_est,
            round(CAST(min($c) AS DOUBLE), 6) AS min_num,
            round(CAST(max($c) AS DOUBLE), 6) AS max_num,
            round(avg(CAST($c AS DOUBLE)), 4) AS mean,
            round(stddev_pop(CAST($c AS DOUBLE)), 4) AS stddev,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
            CAST(NULL AS VARCHAR) AS min_ts, CAST(NULL AS VARCHAR) AS max_ts,
            CAST(NULL AS DOUBLE) AS avg_length, CAST(NULL AS BIGINT) AS max_length
            FROM orders"""
      def str(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            round((count(*) - count($c)) * 1.0 / count(*), 6) AS null_rate,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_est,
            CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
            CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev,
            min($c) AS min_str, max($c) AS max_str,
            CAST(NULL AS VARCHAR) AS min_ts, CAST(NULL AS VARCHAR) AS max_ts,
            round(avg(length($c) * 1.0), 4) AS avg_length,
            CAST(max(length($c)) AS BIGINT) AS max_length
            FROM orders"""
      def ts(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            round((count(*) - count($c)) * 1.0 / count(*), 6) AS null_rate,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_est,
            CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
            CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS stddev,
            CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
            strftime(min($c), '%Y-%m-%d %H:%M:%S') AS min_ts,
            strftime(max($c), '%Y-%m-%d %H:%M:%S') AS max_ts,
            CAST(NULL AS DOUBLE) AS avg_length, CAST(NULL AS BIGINT) AS max_length
            FROM orders"""
      Seq(num("o_orderkey"), num("o_custkey"), str("o_orderstatus"),
        num("o_totalprice"), ts("o_orderdate"), str("o_orderpriority"))
        .mkString("", " UNION ALL ", " ORDER BY \"column\"")
    },
    // exact count + literal TRUE: the engine-side boolean flips (and the
    // hash breaks) if the merged HLL estimate leaves the 2% band
    "hll_orders" ->
      """SELECT count(DISTINCT o_custkey) AS exact_distinct,
         TRUE AS hll_within_2pct FROM orders""",
    "stats_lineitem" ->
      """SELECT count(*) AS cnt, count(l_quantity) AS cnt_quantity,
         count(DISTINCT l_partkey) AS distinct_partkey,
         count(DISTINCT l_suppkey) AS distinct_suppkey,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         round(sum(l_quantity), 4) AS sum_qty FROM lineitem""",
    "unique_orders" ->
      """SELECT count(DISTINCT o_orderkey) AS distinct_keys,
         count(*) AS total,
         (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)) AS dup_keys
         FROM orders""",
    // composite-key uniqueness replay: per-key counts with min-part
    // attribution, rolled up per part — every numeric an explicit BIGINT
    "unique_composite" ->
      """WITH o AS (SELECT CAST(year(o_orderdate) - 1992 AS INT) AS part,
                    o_custkey, o_orderdate FROM orders),
         k AS (SELECT o_custkey, o_orderdate, count(*) AS n,
                 min(part) AS part FROM o GROUP BY 1, 2)
         SELECT part,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys,
           CAST(count(*) AS BIGINT) AS distinct_keys,
           CAST(sum(n) AS BIGINT) AS total_docs
         FROM k GROUP BY part ORDER BY part""",
    "ref_orders_customer" ->
      """SELECT count(*) AS dangling_orders FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
    "ref_probe_side" ->
      """SELECT count(*) AS dangling_orders FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""",
    "chi2_returnflag_years" ->
      """SELECT year(l_shipdate) AS yr, l_returnflag AS flag, count(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "psi_quantity_buckets" ->
      """SELECT CAST(least(floor(l_quantity / 5.0), 9) AS INT) AS bucket, count(*) AS cnt
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "psi_quantity_years" ->
      """WITH b AS (SELECT CAST(least(floor(l_quantity / 5.0), 9) AS INT) AS bucket,
                    (year(l_shipdate) >= 1996) AS is_prod FROM lineitem),
         c AS (SELECT bucket,
                 sum(CASE WHEN is_prod THEN 0 ELSE 1 END) AS c_ref,
                 sum(CASE WHEN is_prod THEN 1 ELSE 0 END) AS c_prod FROM b GROUP BY 1),
         t AS (SELECT sum(c_ref) AS t_ref, sum(c_prod) AS t_prod FROM c)
         SELECT round(sum((greatest(c_prod * 1.0 / t_prod, 1e-6) - greatest(c_ref * 1.0 / t_ref, 1e-6))
                * ln(greatest(c_prod * 1.0 / t_prod, 1e-6) / greatest(c_ref * 1.0 / t_ref, 1e-6))), 6) AS psi
         FROM c, t""",
    "ks_quantity_years" ->
      """WITH c AS (SELECT l_quantity AS q,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 0 ELSE 1 END) AS c_ref,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 1 ELSE 0 END) AS c_prod
               FROM lineitem GROUP BY 1),
         t AS (SELECT sum(c_ref) AS t_ref, sum(c_prod) AS t_prod FROM c),
         cum AS (SELECT q,
                 sum(c_ref) OVER (ORDER BY q) AS cum_ref,
                 sum(c_prod) OVER (ORDER BY q) AS cum_prod FROM c)
         SELECT round(max(abs(cum_ref * 1.0 / t_ref - cum_prod * 1.0 / t_prod)), 6) AS ks_d
         FROM cum, t""",
    "emd_quantity_years" ->
      """WITH c AS (SELECT l_quantity AS q,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 0 ELSE 1 END) AS c_ref,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 1 ELSE 0 END) AS c_prod
               FROM lineitem GROUP BY 1),
         t AS (SELECT sum(c_ref) AS t_ref, sum(c_prod) AS t_prod FROM c),
         cum AS (SELECT q,
                 sum(c_ref) OVER (ORDER BY q) AS cum_ref,
                 sum(c_prod) OVER (ORDER BY q) AS cum_prod,
                 lead(q) OVER (ORDER BY q) AS q_next FROM c)
         SELECT round(sum(abs(cum_ref * 1.0 / t_ref - cum_prod * 1.0 / t_prod)
                * (q_next - q)), 6) AS emd
         FROM cum, t WHERE q_next IS NOT NULL""",
    // per-year Pearson r (normalization-free, so corr() is engine-equal),
    // delta vs the 1995 reference year, same rounding and threshold
    "corr_shift_years" ->
      """WITH r AS (SELECT year(l_shipdate) AS yr,
                      corr(l_quantity, l_extendedprice) AS r
                    FROM lineitem GROUP BY 1),
         ref AS (SELECT r FROM r WHERE yr = 1995)
         SELECT r.yr, round(r.r, 4) AS r, round(ref.r, 4) AS r_ref,
           round(abs(r.r - ref.r), 4) AS delta,
           round(abs(r.r - ref.r), 4) > 0.002 AS is_drift
         FROM r, ref WHERE r.yr <> 1995 ORDER BY r.yr""",
    "jsd_returnflag_years" ->
      """WITH c AS (SELECT l_returnflag AS f,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 0 ELSE 1 END) AS c_ref,
                 sum(CASE WHEN year(l_shipdate) >= 1996 THEN 1 ELSE 0 END) AS c_prod
               FROM lineitem GROUP BY 1),
         t AS (SELECT sum(c_ref) AS t_ref, sum(c_prod) AS t_prod FROM c),
         pq AS (SELECT c_ref * 1.0 / t_ref AS p, c_prod * 1.0 / t_prod AS q,
                 (c_ref * 1.0 / t_ref + c_prod * 1.0 / t_prod) / 2 AS m
               FROM c, t)
         SELECT round(sum(
           CASE WHEN p > 0 THEN p * log2(p / m) ELSE 0 END / 2 +
           CASE WHEN q > 0 THEN q * log2(q / m) ELSE 0 END / 2), 6) AS jsd
         FROM pq""",
    // exact digest fields recomputed from the raw column + literal TRUE
    // gates: the hash breaks if the merged t-digest miscounts weight,
    // drifts an extreme, or lands p50/p95 outside the ±2% rank window
    "tdigest_quantity" ->
      """SELECT count(*) AS n, min(l_quantity) AS min_qty,
         max(l_quantity) AS max_qty,
         TRUE AS p50_in_5pct, TRUE AS p95_in_5pct FROM lineitem""",
    // exact-mode theta set algebra recomputed declaratively: the hash
    // breaks if any sketch, or any union/intersection/difference over
    // them, miscounts by even one key
    "theta_customer_overlap" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
         b AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
         SELECT (SELECT count(*) FROM a) AS n_1995,
           (SELECT count(*) FROM b) AS n_1996,
           (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_both,
           (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_either,
           (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_only_1995""",
    // exact-regime heavy hitters: the sketch never purges at 3 distinct
    // keys, so retained counts must equal the exact groupBy counts
    "freq_hot_keys" ->
      """SELECT l_returnflag AS k, count(*) AS cnt FROM lineitem
         GROUP BY 1
         HAVING count(*) >= greatest(1, CAST(ceil(0.2 * (SELECT count(*) FROM lineitem)) AS BIGINT))
         ORDER BY 1""",
    // plain-join replay: the salted join must be result-invariant, and the
    // TRUE gate breaks the hash if the sketch pass misses the injected key
    "skew_join_hot" ->
      """WITH o2 AS (SELECT CASE WHEN o_orderkey % 4 = 0 THEN 1
                       ELSE o_custkey END AS k, o_totalprice FROM orders)
         SELECT c.c_mktsegment, count(*) AS cnt,
           round(sum(o.o_totalprice), 2) AS sum_price, TRUE AS hot_detected
         FROM o2 o JOIN customer c ON c.c_custkey = o.k
         GROUP BY 1 ORDER BY 1""",
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "events_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS cnt,
         round(sum(value), 4) AS sum_v
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hll_orders" -> (hllOrders _),
    "stats_lineitem" -> (statsLineitem _),
    "unique_orders" -> (uniqueOrders _),
    "unique_composite" -> (uniqueComposite _),
    "ref_orders_customer" -> (refOrdersCustomer _),
    "ref_probe_side" -> (refProbeSide _),
    "chi2_returnflag_years" -> (chi2ReturnflagYears _),
    "psi_quantity_buckets" -> (psiQuantityBuckets _),
    "psi_quantity_years" -> (psiQuantityYears _),
    "ks_quantity_years" -> (ksQuantityYears _),
    "emd_quantity_years" -> (emdQuantityYears _),
    "corr_shift_years" -> (corrShiftYears _),
    "jsd_returnflag_years" -> (jsdReturnflagYears _),
    "tdigest_quantity" -> (tdigestQuantity _),
    "theta_customer_overlap" -> (thetaCustomerOverlap _),
    "topk_orders" -> (topkOrders _),
    "freq_hot_keys" -> (freqHotKeys _),
    "skew_join_hot" -> (skewJoinHot _),
    "table_profile" -> (tableProfile _),
    "table_profile_by" -> (tableProfileBy _),
    "chi2_sliced_years" -> (chi2SlicedYears _),
    "ks_sliced_years" -> (ksSlicedYears _),
    "psi_sliced_years" -> (psiSlicedYears _),
    "events_hourly_agg" -> (eventsHourlyAgg _))
}

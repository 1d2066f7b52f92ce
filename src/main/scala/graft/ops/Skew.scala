package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sketch.{FreqItemsAgg, FreqOps}

/** Explicit skew handling (E13, detection + remedy): the north rule demands
  * skew handled explicitly with "salting on hot doc_id ranges" — which
  * presupposes KNOWING the hot keys. AQE's skew-join splitting reacts to
  * oversized shuffle PARTITIONS at runtime; this module detects oversized
  * KEYS in one narrow pass (frequent-items sketch, O(maxMapSize) state) and
  * applies the classic differentiated salted join: only rows carrying a hot
  * key pay replication, everything else joins untouched.
  *
  * At 100 TB: `heavyKeys` is a single map-side-combined sketch pass (no
  * key-grain shuffle — finding hot keys via groupBy(key).count would BE the
  * skewed shuffle); the detected set is bounded by maxMapSize, so the salt
  * plan's `isin` literal and the replicated build rows stay tiny. */
object Skew {

  case class HotKey(key: String, estimate: Long, lowerBound: Long, upperBound: Long)

  /** One-pass heavy-hitter detection: every key whose mass fraction is
    * ≥ `minFrac` of the scanned rows (NO FALSE NEGATIVES — a cold key may
    * slip in within sketch error; for salting that is harmless, missing a
    * hot one is not). `maxMapSize` bounds task state and must be ≥ 2 /
    * minFrac for the no-false-negative guarantee to be meaningful
    * (Misra–Gries error ≤ n / maxMapSize). */
  def heavyKeys(df: DataFrame, keyCol: String, minFrac: Double = 0.01,
                maxMapSize: Int = 1024): Seq[HotKey] = {
    require(minFrac > 0 && minFrac < 1, s"minFrac must be in (0,1), got $minFrac")
    require(maxMapSize * minFrac >= 2.0,
      s"maxMapSize=$maxMapSize too small for minFrac=$minFrac: sketch error " +
        s"(n/maxMapSize) would exceed the detection threshold - raise " +
        s"maxMapSize to >= ${math.ceil(2.0 / minFrac).toInt}")
    val row = df.select(col(keyCol).cast("string").as("k"))
      .agg(FreqItemsAgg.freqItems(col("k"), maxMapSize).as("sk"))
      .head()
    val bytes = row.getAs[Array[Byte]]("sk")
    val n = FreqOps.streamLength(bytes)
    if (n == 0) return Seq.empty
    val threshold = math.max(1L, math.ceil(n * minFrac).toLong)
    FreqOps.heavyHitters(bytes, threshold)
      .map(h => HotKey(h.item, h.estimate, h.lowerBound, h.upperBound))
      .sortBy(h => (-h.estimate, h.key))
  }

  /** Differentiated salted INNER join on `key`: rows of `left` whose key is
    * in `hot` scatter over `salts` reducers (salt from a row-unique id — the
    * join OUTPUT is salt-invariant, so nondeterministic salt placement is
    * harmless); matching `right` rows replicate `salts`×. Cold keys pay
    * salt 0 and one build row — no replication tax on the non-skewed bulk.
    * `hot` is bounded (≤ sketch maxMapSize), so both `isin` literals and the
    * replication factor stay small. Equal results to a plain inner join
    * (spec-asserted); use when the plain join's hottest key overwhelms one
    * reducer and AQE's partition-grain splitting can't help (e.g. a single
    * key larger than every other partition combined). */
  def saltedJoinHot(left: DataFrame, right: DataFrame, key: String,
                    hot: Seq[String], salts: Int = 16): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    require(hot.nonEmpty, "saltedJoinHot: empty hot-key set - use a plain join")
    val dupCols = left.columns.toSet intersect right.columns.toSet - key
    require(dupCols.isEmpty,
      s"saltedJoinHot: non-key columns ${dupCols.mkString(",")} exist on both sides")
    val isHot: Column => Column = c => c.cast("string").isin(hot: _*)
    val l = left.withColumn("__salt",
      when(isHot(col(key)),
        pmod(xxhash64(monotonically_increasing_id(), lit("skew")), lit(salts.toLong)).cast("int"))
        .otherwise(lit(0)))
    val r = right
      .withColumn("__salt", explode(
        when(isHot(col(key)), sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0)))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Detect-then-join: sketch the left side's key mass, salt only if any key
    * crosses `minFrac`, else plain join. Returns the joined frame plus the
    * detected hot keys (empty = plain path taken). */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, key: String,
                     minFrac: Double = 0.05, salts: Int = 16,
                     maxMapSize: Int = 1024): (DataFrame, Seq[HotKey]) = {
    val hot = heavyKeys(left, key, minFrac, maxMapSize)
    if (hot.isEmpty) (left.join(right, Seq(key)), hot)
    else (saltedJoinHot(left, right, key, hot.map(_.key), salts), hot)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing — the concat-then-chunk document→training-
  * sequence assignment an LM pretraining pipeline runs after curation: docs
  * are laid out in a canonical order, their token streams concatenated, and
  * the stream cut every `budget` tokens; each doc is assigned the pack
  * (training sequence) where it STARTS (the trainer's chunker splits
  * straddling docs — membership and order are what the pipeline must pin).
  *
  * Determinism is the contract, exactly like [[Sample]]: layout order is
  * (md5Rank32(id), id) within a rank-derived shard, a pure function of the
  * doc id — the same docs land in the same packs on every run, partitioning,
  * and cluster size, and a DuckDB oracle replays the assignment bit-for-bit.
  * `monotonically_increasing_id`/`zipWithIndex` layouts are none of that
  * (partition-layout-dependent), and a global single-order cumsum is a
  * one-partition window at 10^12 docs.
  *
  * Scale shape: ONE shuffle (hash by shard) + per-shard sort for the window
  * cumsum. `shards` bounds the sort grain and fixes the output independent
  * of cluster width — at 10^12 docs set shards ≈ 10^5 so each shard sorts
  * ~10^7 slim rows (id, rank, tok); packs are identified by (shard, pack)
  * so pack ids never coordinate across shards (no global counter, no second
  * shuffle). The rank-derived shard also balances skew by construction:
  * shard populations are binomial over a uniform 32-bit hash, so no salting
  * is needed.
  */
object Pack {

  /** Assign each doc to its (shard, pack, start_off) under a token budget.
    *
    * Output = input columns + `shard` (rank-derived, `[0, shards)`),
    * `start_off` (token offset of the doc in its shard's concatenated
    * stream), `pack` (floor(start_off / budget), contiguous from 0 within
    * each shard).
    *
    * NULL-id rows are dropped (no identity → no deterministic layout
    * position — same policy as [[Sample.byFraction]]); enforce id presence
    * upstream. Docs longer than `budget` keep their start pack (the chunker
    * splits them across as many sequences as they need).
    */
  def packByBudget(df: DataFrame, idCol: String, tokCol: String,
                   budget: Long, shards: Int): DataFrame = {
    require(budget >= 1, s"packByBudget: budget must be >= 1, got $budget")
    require(shards >= 1, s"packByBudget: shards must be >= 1, got $shards")
    val clash = df.columns.toSet.intersect(Set("shard", "start_off", "pack", "__rnk"))
    require(clash.isEmpty,
      s"packByBudget: input already has output column(s) ${clash.mkString(", ")} — " +
        "rename them first (silent overwrite would corrupt caller data)")
    val rank: Column = Sample.md5Rank32(col(idCol))
    val w = Window.partitionBy(col("shard")).orderBy(col("__rnk"), col(idCol))
    df.filter(col(idCol).isNotNull)
      .withColumn("__rnk", rank)
      .withColumn("shard", pmod(col("__rnk"), lit(shards.toLong)))
      .withColumn("start_off",
        coalesce(sum(col(tokCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack", floor(col("start_off") / lit(budget)).cast("long"))
      .drop("__rnk")
  }

  /** Per-shard pack census: packs and total tokens per shard — the summary a
    * pipeline checks before writing sequence files. By construction
    * `packs == floor(lastStart / budget) + 1` where `lastStart` is the
    * shard's final doc's start offset (= tokens − lastDocTokens), which
    * gives the bound `packs <= ceil(tokens / budget)`: STRICT inequality
    * whenever the last-starting doc begins before the final budget
    * boundary but its tokens spill past it — that happens with perfectly
    * ordinary sub-budget docs, so ceil equality is NOT an invariant
    * (spec-asserted either way on replayed layouts). */
  def packStats(packed: DataFrame, tokCol: String): DataFrame =
    packed.groupBy(col("shard")).agg(
      (max(col("pack")) + 1).as("packs"),
      sum(col(tokCol)).as("tokens"),
      count(lit(1)).as("docs"))
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Packing-at-volume probe: `Pack.packByBudget` at ≥50M docs — wall,
  * shuffle bytes, shard balance, and the packStats invariant checked at
  * volume. The operator is DuckDB-oracled at sf0.01 (`pack_sequences`);
  * this probe is the VOLUME evidence for its scale shape: ONE shuffle of
  * slim (id, rank, tok) rows hashed by shard, per-shard window sort whose
  * grain `shards` bounds, no global counter. The rank-derived shard is
  * binomially balanced by construction — the probe prints the observed
  * min/max shard population to show no salting is needed.
  *
  * `runMain graft.tools.PackProbe [nDocs] [shards]` (defaults 50,000,000
  * and 512).
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000000L)
    val shards = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-pack-probe")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val meter = new ProbeUtil.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    // slim synthetic corpus: (doc_id, n_tok) — packing never reads text
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      (pmod(xxhash64(col("id")), lit(2000L)) + 48L).as("n_tok"))

    val s0 = meter.snapshot
    val (stats, t) = ProbeUtil.time {
      graft.ops.Pack.packStats(
        graft.ops.Pack.packByBudget(corpus, "doc_id", "n_tok",
          budget = 8192L, shards = shards), "n_tok").collect()
    }
    val s1 = meter.snapshot
    val docs = stats.map(_.getAs[Long]("docs"))
    val toks = stats.map(_.getAs[Long]("tokens")).sum
    val packs = stats.map(_.getAs[Long]("packs")).sum
    println(f"packByBudget+stats: $t%8.1f s for $n docs, " +
      f"shuffle r/w ${(s1._1 - s0._1) / 1e9}%.2f/${(s1._2 - s0._2) / 1e9}%.2f GB")
    println(f"shards=${stats.length} docs min/max per shard ${docs.min}/${docs.max} " +
      f"(${(docs.max - docs.min) * 100.0 / docs.min}%.1f%% spread), " +
      f"$toks total tokens -> $packs packs of 8192")
    require(stats.length == shards && docs.sum == n,
      s"lost rows: ${docs.sum} of $n across ${stats.length} shards")
    // the true invariant at volume: packs per shard <= ceil(tokens/budget)
    stats.foreach { r =>
      val p = r.getAs[Long]("packs"); val tk = r.getAs[Long]("tokens")
      require(p <= (tk + 8191L) / 8192L && p >= 1L,
        s"shard ${r.getAs[Long]("shard")}: packs=$p tokens=$tk")
    }
    println("packStats invariant holds on every shard")
    spark.stop()
  }
}

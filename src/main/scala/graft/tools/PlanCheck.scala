package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.DocsGen

/** Prints the executed plans of the engine's hot paths so the scale
  * properties can be AUDITED, not assumed:
  *   - partition pruning on snapshot-pinned reads (PartitionFilters)
  *   - nested-column pruning (ReadSchema must not include spans.text for the
  *     stats pass when slimmed)
  *   - ObjectHashAggregate partial/final for the custom aggregates
  *   - BroadcastHashJoin for the referential anti-join
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val work = java.nio.file.Files.createTempDirectory("plan").toString
    DocsGen.docs(spark, 5000, DocsGen.goldenScenario)
      .write.partitionBy("part").parquet(s"$work/docs")
    val docs = spark.read.parquet(s"$work/docs")
    def interesting(plan: Any): String =
      plan.toString.split("\n")
        .filter(l => l.contains("ReadSchema") || l.contains("PartitionFilters") ||
          l.contains("PushedFilters") || l.contains("Join") ||
          l.contains("Aggregate") || l.contains("Exchange") ||
          l.contains("Window"))
        .map(_.trim.take(600)).mkString("\n")

    println("=== DocStatsAgg stats pass (field-array inputs, nested pruning) ===")
    println(interesting(docs.groupBy($"part")
      .agg(graft.sketch.DocStatsAgg.docStats(col("spans.kind"), col("spans.offset"),
        xxhash64($"doc_id"), 100))
      .queryExecution.executedPlan))

    println("\n=== explode + field access (nested pruning reference) ===")
    println(interesting(docs.select($"part", explode($"spans").as("s"))
      .select($"part", $"s.kind", $"s.offset").groupBy($"part", $"kind").count()
      .queryExecution.executedPlan))

    println("\n=== partition pruning ===")
    println(interesting(docs.filter($"part" === 3).select($"doc_id")
      .queryExecution.executedPlan))

    println("\n=== referential anti-join ===")
    val media = DocsGen.media(spark, 1000)
    println(interesting(graft.checks.ConstraintChecks.referential(docs, media, "pc")
      ._1.queryExecution.executedPlan))

    println("\n=== uniqueness (single-shuffle default) ===")
    println(interesting(graft.checks.ConstraintChecks.uniqueness(docs, "pc")
      ._1.queryExecution.executedPlan))

    println("\n=== kNN join (bucket-keyed, no cartesian) ===")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    println(interesting(graft.ops.Similarity
      .knnJoin(embs, "vec_id", "embedding", 5, planes = 5, probes = 6)
      .queryExecution.executedPlan))

    println("\n=== decontamination gate (eval union broadcast; matches-only exchange) ===")
    val txt = docs.select($"doc_id",
      concat_ws(" ", transform($"spans.offset", o => concat(lit("w"), o))).as("text"))
    println(interesting(graft.ops.Decontaminate.contaminationReport(
      txt, "doc_id", "text",
      txt.filter(pmod(xxhash64($"doc_id"), lit(20L)) === 0L), "text", n = 3)
      .queryExecution.executedPlan))

    println("\n=== sequence packing (ONE exchange by shard; per-shard window, no global sort) ===")
    println(interesting(graft.ops.Pack.packByBudget(
      txt.select($"doc_id", lit(7L).as("n_tok")), "doc_id", "n_tok", 512L, 8)
      .queryExecution.executedPlan))

    println("\n=== dimred latent index (stage-1 scan prunes to (id, latent); broadcast re-rank) ===")
    val embRows = (1L to 200L).map { id =>
      val rng = new graft.stats.StatMath.SplitMix64(id)
      (id, Seq.fill(64)(rng.nextDouble() * 2 - 1))
    }
    graft.ops.DimRed.latentIndexWrite(embRows.toDF("id", "emb"), "id", "emb",
      s"$work/latent", outDim = 8, seed = 7)
    val qv = embRows.head._2.toArray
    println(interesting(graft.ops.DimRed
      .projectedTopKIndexed(spark, s"$work/latent", qv, k = 5)
      .queryExecution.executedPlan))

    println("\n=== embedding decon, exact rung (BNLJ over the broadcast eval matrix; " +
      "the only Exchange carries id-grain MATCH rows) ===")
    val embDf = embRows.toDF("id", "emb")
    println(interesting(graft.ops.Decontaminate.embeddingReport(
        embDf, "id", "emb", embDf.limit(10), "emb", threshold = 0.99)
      .queryExecution.executedPlan))

    println("\n=== exact-substring spans (partial gram count before the slim-key " +
      "exchange; island window PARTITIONED by doc — no global sort) ===")
    val sdocs = (1L to 50L).map(i => (i, ("tok " * 20).trim + s" unique$i"))
      .toDF("doc_id", "text")
    println(interesting(graft.ops.SubstringDedup.duplicateSpans(
        sdocs, "doc_id", "text")
      .queryExecution.executedPlan))

    println("\n=== line dedup (partial count before the slim hashed-key exchange; " +
      "dup-only join-back; doc-grain rebuild aggregate) ===")
    println(interesting(graft.ops.LineDedup.dedupLines(
        sdocs, "doc_id", "text")
      .queryExecution.executedPlan))

    println("\n=== compaction plan (window PARTITIONED by part — no global sort; " +
      "metadata-grain rows only) ===")
    val fmeta = (1 to 100).map(i => (i % 4, f"f$i%04d", (i * 97 % 900 + 10).toLong))
      .toDF("part", "file", "bytes")
    println(interesting(graft.engine.Compaction.plan(fmeta, 1000L, 500L)
      .queryExecution.executedPlan))

    println("\n=== bloom decontamination gate (per-row scalar against the " +
      "task-constant blob — ZERO Exchange anywhere) ===")
    val blob = graft.ops.Decontaminate.prepareBenchBloom(
      txt.filter(pmod(xxhash64($"doc_id"), lit(20L)) === 0L), "text", n = 3,
      expectedShingles = 100000L, fpp = 0.01)
    println(interesting(graft.ops.Decontaminate.dropByBloom(
        txt, "doc_id", "text", blob, n = 3)
      .queryExecution.executedPlan))

    println("\n=== token-budget selection (ONE range exchange + local " +
      "sort-within-partitions; NO single-partition window, NO global sort) ===")
    val (tb, tbRelease) = graft.ops.Sample.selectByTokenBudgetManaged(
      txt.select($"doc_id", pmod(xxhash64($"doc_id"), lit(100L)).as("q"),
        lit(7L).as("n_tok")), "doc_id", "q", "n_tok", 10000L)
    println(interesting(tb.queryExecution.executedPlan))
    tbRelease()

    val ev = spark.range(2000).select(col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) +
        pmod(xxhash64(col("id"), lit("ts")), lit(86400000000L))).as("ts"),
      pmod(xxhash64(col("id"), lit("u")), lit(50L)).as("user_id"))

    println("\n=== session rollup (ONE Exchange by key feeds the Window; the " +
      "grain-collapsing partial agg runs BEFORE the session-grain exchange) ===")
    println(interesting(graft.ops.Temporal.sessionStats(ev, "user_id", "ts",
      "event_id", 21600L).queryExecution.executedPlan))

    println("\n=== as-of join (union-and-carry: ONE Exchange, ONE Window, " +
      "NO Join operator anywhere) ===")
    println(interesting(graft.ops.Temporal.asofJoin(
      ev.filter(pmod(col("event_id"), lit(4L)) === 0L),
      ev.filter(pmod(col("event_id"), lit(4L)) =!= 0L),
      "user_id", "ts", "event_id").queryExecution.executedPlan))

    val docTexts = docs.select($"doc_id",
      concat_ws(" ", transform($"spans", sp => sp.getField("kind"))).as("text"))
    println("\n=== tf-idf keywords (partial collect_list BEFORE the doc-grain " +
      "exchange; per-doc top-k is array_sort+slice, NO Window; minDf prunes " +
      "the vocab before the idf join) ===")
    println(interesting(graft.ops.Vocab.tfIdfTopTerms(docTexts, "doc_id",
      "text", k = 3, minDf = 2).queryExecution.executedPlan))

    println("\n=== epoch upsampling (project + Generate only — ZERO Exchange) ===")
    println(interesting(graft.ops.Sample.upsampleByFactors(
      docs.select($"doc_id", $"part".cast("string").as("grp")),
      "doc_id", "grp", Map("3" -> 2.5), 1.0).queryExecution.executedPlan))

    println("\n=== column profiler (ONE fused aggregate over all columns — " +
      "no Join, no Expand on the default HLL path) ===")
    println(interesting(graft.checks.Profiler.aggPlan(docs, Seq.empty,
      exactDistinct = false).queryExecution.executedPlan))

    println("\n=== streaming novel-type alarm, batch twin (literal NOT-IN " +
      "filter inlines before the slim windowed agg — no join against the " +
      "contract) ===")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    println(interesting(graft.ops.StreamingOps.novelTypesPerWindow(
      events, Seq("click", "purchase", "signup", "view"))
      .queryExecution.executedPlan))

    println("\n=== media-integrity blast radius (decode-probe violations " +
      "BROADCAST into a left-semi against the exploded span refs; the only " +
      "Exchange carries per-part counts) ===")
    val badRefs = graft.checks.MediaIntegrity.violations(
        graft.checks.MediaIntegrity.syntheticPayloadMedia(spark, 2000,
          corruptEvery = 97))
      .select(col("media_ref"))
    println(interesting(docs
      .select($"part", explode($"spans").as("sp"))
      .select($"part", $"sp.media_ref".as("media_ref"))
      .filter($"media_ref".isNotNull)
      .join(broadcast(badRefs), Seq("media_ref"), "left_semi")
      .groupBy($"part").agg(count(lit(1)).as("bad_span_refs"))
      .queryExecution.executedPlan))
    spark.stop()
  }
}

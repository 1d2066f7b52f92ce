package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ANN index maintenance: appended vectors must be served by the
  * existing readers with no rebuild, partition pruning intact, and config
  * drift must fail loud. */
class IndexAppendSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val half1 = embs.filter($"vec_id" % 2 === 0)
  lazy val half2 = embs.filter($"vec_id" % 2 === 1)

  private def queryVec: Array[Double] = embs.filter($"vec_id" === 1)
    .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray

  test("LSH append: appended batch served identically to a full rebuild; " +
    "partition pruning survives the append") {
    val inc = java.nio.file.Files.createTempDirectory("lsh-inc").toString
    val full = java.nio.file.Files.createTempDirectory("lsh-full").toString
    Similarity.lshIndexWrite(half1, "vec_id", "embedding", inc, planes = 4)
    Similarity.lshIndexAppend(half2, "vec_id", "embedding", inc, planes = 4)
    Similarity.lshIndexWrite(embs, "vec_id", "embedding", full, planes = 4)
    val q = queryVec
    val a = Similarity.lshTopKIndexed(spark, inc, q, k = 8, planes = 4, probes = 5)
    val b = Similarity.lshTopKIndexed(spark, full, q, k = 8, planes = 4, probes = 5)
    assert(a.as[(Long, Double)].collect().toSeq == b.as[(Long, Double)].collect().toSeq)
    // a vector that only exists in the APPENDED batch is findable: query by
    // its own embedding, it must rank first (cos = 1 with itself)
    val own = embs.filter($"vec_id" === 1) // odd id → lives in the append
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0).toArray
    val top = Similarity.lshTopKIndexed(spark, inc, own, k = 1, planes = 4, probes = 1)
      .as[(Long, Double)].head()
    assert(top._1 == 1L && top._2 == 1.0, s"appended vector not served: $top")
    // pruning proof on the appended index (old + new files per bucket)
    val plan = a.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("")
    assert(pf.contains("bucket#"), plan.take(1500))
  }

  test("LSH append with mismatched planes fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-mismatch").toString
    Similarity.lshIndexWrite(half1, "vec_id", "embedding", dir, planes = 4)
    val e = intercept[IllegalArgumentException](
      Similarity.lshIndexAppend(half2, "vec_id", "embedding", dir, planes = 6))
    assert(e.getMessage.contains("planes=4"))
  }

  test("IVF append: frozen-centroid assignment; exact config over the " +
    "appended index equals brute force on the union corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-inc").toString
    IvfAnn.indexWrite(half1, "vec_id", "embedding", dir, nLists = 4)
    IvfAnn.indexAppend(half2, "vec_id", "embedding", dir)
    val q = queryVec
    // nprobe = nLists probes every list → exact brute force over ALL rows,
    // old and appended alike
    val got = IvfAnn.topKIndexed(spark, dir, q, k = 10, nprobe = 4)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == want, s"got=$got want=$want")
    assert(got.exists(_._1 % 2 == 1), "no appended (odd) vector in the top-k " +
      "— fixture too weak or append not served")
  }

  test("batch ANN releases its query-side persist deterministically " +
    "(no lingering persisted RDDs after release)") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-release").toString
    Similarity.lshIndexWrite(half1, "vec_id", "embedding", dir, planes = 4)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (plan, release) = Similarity.lshTopKIndexedBatchManaged(
      spark, dir, embs.limit(20), "vec_id", "embedding", k = 5, planes = 4, probes = 2)
    assert(plan.count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
      "the exploded query side should be persisted while the plan is live")
    release()
    // unpersist is async (blocking = false) — poll briefly
    val deadline = System.nanoTime() + 10e9.toLong
    while (spark.sparkContext.getPersistentRDDs.keySet.size > before.size &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      s"persisted RDDs leaked: ${spark.sparkContext.getPersistentRDDs.keySet -- before}")
  }

  test("IVF raw append onto an IVF-PQ index fails loud (codebook sidecar is the family marker)") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-guard").toString
    Pq.indexWrite(embs.filter($"vec_id" > 0 && $"vec_id" < 100),
      "vec_id", "embedding", dir, nLists = 2, m = 8, sampleN = 200)
    val e = intercept[IllegalArgumentException](
      IvfAnn.indexAppend(half2, "vec_id", "embedding", dir))
    assert(e.getMessage.contains("codebook"), e.getMessage)
  }

  test("LSH index compaction: file count drops, results and pruning " +
    "identical, config sidecar survives (append guard still fails loud)") {
    val dir = java.nio.file.Files.createTempDirectory("lsh-compact").toString
    Similarity.lshIndexWrite(half1, "vec_id", "embedding", dir, planes = 4)
    Similarity.lshIndexAppend(half2, "vec_id", "embedding", dir, planes = 4)
    val q = queryVec
    val before = Similarity.lshTopKIndexed(spark, dir, q, k = 8, planes = 4, probes = 5)
      .as[(Long, Double)].collect().toSeq
    val (nBefore, nAfter) = IndexMaintenance.compactPartitionedIndex(spark, dir, "bucket")
    assert(nAfter < nBefore, s"compaction did not shrink: $nBefore -> $nAfter")
    val afterDf = Similarity.lshTopKIndexed(spark, dir, q, k = 8, planes = 4, probes = 5)
    assert(afterDf.as[(Long, Double)].collect().toSeq == before)
    // pruning survives the rewrite
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r
      .findFirstIn(afterDf.queryExecution.executedPlan.toString).getOrElse("")
    assert(pf.contains("bucket#"), pf)
    // the _graft_lsh_meta sidecar was carried: config drift still fails loud
    val e = intercept[IllegalArgumentException](
      Similarity.lshIndexAppend(half2, "vec_id", "embedding", dir, planes = 6))
    assert(e.getMessage.contains("planes=4"))
  }

  test("streaming near-dup store compaction between micro-batches: " +
    "cross-batch drops still exact afterwards") {
    val root = java.nio.file.Files.createTempDirectory("ndd-compact").toString
    val posting = s"$root/posting"; val shingles = s"$root/shingles"
    val survivors = s"$root/survivors"
    // per-id-unique tokens: base docs share no shingles, so the ONLY
    // near-dup pairs are the injected perturbed copies
    val mk = (id: Long) => (id, (0 until 10).map(j => s"t${id}x$j").mkString(" "))
    val batch1 = (0L until 20L).map(mk).toDF("doc_id", "text")
    StreamingOps.nearDupDedupBatch(batch1, "doc_id", "text",
      posting, shingles, survivors, indexParts = 8)
    val (pb0, pb1) = IndexMaintenance.compactPartitionedIndex(spark, posting, "pb")
    val (sp0, sp1) = IndexMaintenance.compactPartitionedIndex(spark, shingles, "sp")
    assert(pb1 <= pb0 && sp1 <= sp0)
    // batch 2: fresh docs + near-copies of batch-1 docs — the copies must be
    // dropped via the COMPACTED index (cross-batch path)
    val batch2 = ((20L until 30L).map(mk) ++
      Seq(0L, 6L, 12L).map(id => (id + 100L, mk(id)._2 + " perturbed")))
      .toDF("doc_id", "text")
    StreamingOps.nearDupDedupBatch(batch2, "doc_id", "text",
      posting, shingles, survivors, indexParts = 8)
    val kept = spark.read.parquet(survivors).select($"doc_id").as[Long].collect().sorted
    assert(kept.toSeq == (0L until 30L).toSeq,
      s"expected 0..29, got ${kept.mkString(",")}")
    // the param-guard meta (a SIBLING of the compacted dirs) still bites
    val e = intercept[IllegalArgumentException](
      StreamingOps.nearDupDedupBatch(batch1, "doc_id", "text",
        posting, shingles, survivors, numHashes = 16, bands = 4, indexParts = 8))
    assert(e.getMessage.contains("incomparable"))
  }

  test("appends with a DIFFERENT id type fail loud across all three " +
    "families (mixed-type files would corrupt the layout)") {
    val int32 = half2.withColumn("vid32", $"vec_id".cast("int"))
    val lsh = java.nio.file.Files.createTempDirectory("lsh-idtype").toString
    Similarity.lshIndexWrite(half1, "vec_id", "embedding", lsh, planes = 4)
    val e1 = intercept[IllegalArgumentException](
      Similarity.lshIndexAppend(int32, "vid32", "embedding", lsh, planes = 4))
    assert(e1.getMessage.contains("id types"))
    val ivf = java.nio.file.Files.createTempDirectory("ivf-idtype").toString
    IvfAnn.indexWrite(half1, "vec_id", "embedding", ivf, nLists = 2)
    val e2 = intercept[IllegalArgumentException](
      IvfAnn.indexAppend(int32, "vid32", "embedding", ivf))
    assert(e2.getMessage.contains("id types"))
    val pq = java.nio.file.Files.createTempDirectory("pq-idtype").toString
    Pq.indexWrite(half1, "vec_id", "embedding", pq, nLists = 2, m = 8, sampleN = 200)
    val e3 = intercept[IllegalArgumentException](
      Pq.indexAppend(int32, "vid32", "embedding", pq))
    assert(e3.getMessage.contains("id types"))
  }

  test("IVF append without a centroid sidecar fails loud") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-nosidecar").toString
    val e = intercept[Exception](
      IvfAnn.indexAppend(half2, "vec_id", "embedding", dir))
    assert(e.getMessage.contains("centroid") || e.isInstanceOf[org.apache.spark.sql.AnalysisException])
  }
}

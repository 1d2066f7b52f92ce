package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components: checked against a driver-side
  * union-find on random graphs, on deep chains (iteration-count stress), on
  * string ids, and for the cluster-exact curation semantics it exists for. */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical root = min member of component
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val byRoot = members.groupBy(find)
    byRoot.valuesIterator.flatMap { ms =>
      val root = ms.min
      ms.map(_ -> root)
    }.toMap
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("matches union-find on a random pair soup (chains, stars, cliques, bridges)") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(300)(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    assert(ccOf(pairs) == unionFind(pairs))
  }

  test("deep chain (length 300) converges within the doubling bound") {
    val chain = (0L until 300L).sliding(2).map(s => (s(0), s(1))).toSeq
    val cc = ccOf(chain)
    assert(cc.size == 300 && cc.values.forall(_ == 0L))
  }

  test("multiple components, reversed/duplicated/self pairs tolerated") {
    val pairs = Seq((5L, 3L), (3L, 5L), (5L, 5L), (10L, 12L), (12L, 11L), (20L, 21L))
      .filter(p => p._1 != p._2)
    val cc = ccOf(pairs ++ Seq((5L, 3L)))
    assert(cc == Map(3L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("string ids: lexicographic component roots") {
    val cc = ConnectedComponents.components(
        Seq(("b", "c"), ("c", "d"), ("x", "y")).toDF("id_a", "id_b"))
      .as[(String, String)].collect().toMap
    assert(cc == Map("b" -> "b", "c" -> "b", "d" -> "b", "x" -> "x", "y" -> "x"))
  }

  test("empty pair set yields empty components") {
    assert(ccOf(Seq.empty).isEmpty)
  }

  test("cluster-exact canonicalization keeps EXACTLY one survivor per " +
    "component where smaller-id-wins can drop a whole bridged cluster") {
    // B~C is a pair between two docs that are each the larger side of some
    // other pair: smaller-id-wins drops B (via A~B), C (via B~C) AND keeps
    // only A — but B and C bridge to A only through B, so the true cluster
    // is {A,B,C}: both policies agree here. The DIFFERENTIATING fixture:
    //   pairs (A,C), (B,C) with A<B<C — smaller-id-wins drops C only
    //   (B is never a larger side), keeping {A, B}; cluster-exact resolves
    //   {A,B,C} as ONE component and keeps only A.
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val droppedCc = ConnectedComponents.droppedByComponent(pairs)
      .as[Long].collect().sorted.toSeq
    assert(droppedCc == Seq(2L, 3L), "CC must drop every non-root member")
    val droppedPairwise = pairs.select(col("id_b")).distinct()
      .as[Long].collect().sorted.toSeq
    assert(droppedPairwise == Seq(3L), "smaller-id-wins keeps the bridged doc")
  }

  test("droppedByPolicy: highest score survives, tie breaks to min id, " +
    "unscored node fails loud") {
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    // component {1,2,3}: node 2 has the top score -> 1 and 3 drop
    val scored = Seq((1L, 10L), (2L, 99L), (3L, 50L)).toDF("doc_id", "q")
    val dropped = ConnectedComponents.droppedByPolicy(pairs, scored, "doc_id", "q")
      .as[Long].collect().sorted.toSeq
    assert(dropped == Seq(1L, 3L), s"got $dropped")
    // equal scores: min id survives (the droppedByComponent root rule)
    val tie = ConnectedComponents.droppedByPolicy(
        Seq((7L, 8L)).toDF("id_a", "id_b"),
        Seq((7L, 5L), (8L, 5L)).toDF("doc_id", "q"), "doc_id", "q")
      .as[Long].collect().toSeq
    assert(tie == Seq(8L))
    // a node missing from `scored` must fail loud, not silently resolve
    val ex = intercept[Exception] {
      ConnectedComponents.droppedByPolicy(pairs,
        Seq((1L, 10L), (2L, 99L)).toDF("doc_id", "q"), "doc_id", "q")
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("curateWithNearDupQualityCC: the best-quality cluster member " +
    "survives where the min-id root rule would keep a worse doc") {
    import org.apache.spark.sql.functions.col
    val base = "the quick brown fox jumps over the lazy dog and runs to the " +
      "big red barn where it sleeps for the night in a warm bed of hay"
    // doc 11 extends doc 10 with enough rich text to score strictly higher
    // quality while keeping shingle Jaccard >= 0.5 (appended shingles < base
    // shingle count)
    val richer = base + " and it dreams of the green fields in the valley"
    val docs = Seq(
      (10L, base), (11L, richer),
      (50L, "a completely different document about the weather in the city " +
        "of paris where it rains for most of the autumn and the people use " +
        "umbrellas to stay dry on their way to work every single day"))
      .toDF("doc_id", "text")
    // precondition: 11 really does out-score 10 under the gate formula
    val (_, q, _) = TextOps.gateColumns(col("text"))
    val scores = docs.select(col("doc_id"), q.as("q")).as[(Long, Long)]
      .collect().toMap
    assert(scores(11L) > scores(10L),
      s"fixture broke: q(11)=${scores(11L)} !> q(10)=${scores(10L)}")
    val out = Curate.curateWithNearDupQualityCC(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 50L), s"expected best-quality survivor, got $out")
    // and the min-id policy keeps 10 on the same fixture
    val ccOut = Curate.curateWithNearDupCC(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(ccOut == Seq(10L, 50L), s"got $ccOut")
  }

  test("curateWithNearDupCC: one survivor per near-dup cluster end-to-end") {
    // three near-identical texts (pairwise Jaccard > 0.5) + one unrelated —
    // long enough in stopword/letter mix to clear the quality/lang gates
    val base = "the quick brown fox jumps over the lazy dog and runs to the " +
      "big red barn where it sleeps for the night in a warm bed of hay"
    val docs = Seq(
      (10L, base),
      (11L, base + " again"),
      (12L, base + " twice"),
      (50L, "a completely different document about the weather in the city " +
        "of paris where it rains for most of the autumn and the people use " +
        "umbrellas to stay dry on their way to work every single day"))
      .toDF("doc_id", "text")
    val out = Curate.curateWithNearDupCC(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(out == Seq(10L, 50L), s"expected cluster roots only, got $out")
  }
}

package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 37 + 5).as("n_tok"))

  test("start offsets are the exact cumulative token stream per shard") {
    val packed = Pack.packByBudget(corpus(2000), "doc_id", "n_tok",
      budget = 128L, shards = 4).collect()
    val byShard = packed.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet == Set(0L, 1L, 2L, 3L))
    byShard.foreach { case (_, rows) =>
      // replay the layout order: md5Rank32(id) asc, id asc
      val ordered = rows.sortBy(r => (graft.ops.SampleTestUtil.rank32(
        r.getAs[Long]("doc_id")), r.getAs[Long]("doc_id")))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("start_off") == cum,
          s"doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("pack") == cum / 128L)
        cum += r.getAs[Long]("n_tok")
      }
    }
  }

  test("assignment is invariant to input partitioning") {
    val base = corpus(3000)
    def run(parts: Int) =
      Pack.packByBudget(base.repartition(parts), "doc_id", "n_tok",
        budget = 256L, shards = 8)
        .select("doc_id", "shard", "pack", "start_off")
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(run(3).toSeq == run(11).toSeq)
  }

  test("packStats: packs == floor(lastStart/budget)+1, bounded by ceil(tokens/budget)") {
    // the TRUE invariant (ceil equality is NOT one: a sub-budget doc whose
    // start lands before the final boundary but whose tokens spill past it
    // gives packs < ceil — several n values below hit that case)
    Seq(1000, 1500, 2000, 3000).foreach { n =>
      val packed = Pack.packByBudget(corpus(n), "doc_id", "n_tok",
        budget = 128L, shards = 4).collect()
      val stats = Pack.packStats(
        Pack.packByBudget(corpus(n), "doc_id", "n_tok", 128L, 4), "n_tok")
        .collect().map(r => r.getAs[Long]("shard") -> r).toMap
      packed.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rows) =>
        val ordered = rows.sortBy(r => (SampleTestUtil.rank32(
          r.getAs[Long]("doc_id")), r.getAs[Long]("doc_id")))
        val lastStart = ordered.last.getAs[Long]("start_off")
        val tokens = rows.map(_.getAs[Long]("n_tok")).sum
        val packs = stats(shard).getAs[Long]("packs")
        assert(packs == lastStart / 128L + 1L, s"n=$n shard $shard")
        assert(packs <= (tokens + 127L) / 128L, s"n=$n shard $shard")
        assert(stats(shard).getAs[Long]("tokens") == tokens)
      }
      assert(stats.values.map(_.getAs[Long]("docs")).sum == n.toLong)
    }
  }

  test("null ids are dropped; oversized doc keeps its start pack") {
    val df = Seq((Some(1L), 10L), (None, 10L), (Some(2L), 1000L), (Some(3L), 10L))
      .toDF("doc_id", "n_tok")
    val packed = Pack.packByBudget(df, "doc_id", "n_tok",
      budget = 64L, shards = 1).collect()
    assert(packed.length == 3)
    val byId = packed.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // rank order for ids 1,2,3 under md5Rank32 — recompute, then check the
    // 1000-token doc occupies one start pack and shifts its successor
    val order = Seq(1L, 2L, 3L).sortBy(id => (SampleTestUtil.rank32(id), id))
    var cum = 0L
    order.foreach { id =>
      assert(byId(id).getAs[Long]("start_off") == cum)
      assert(byId(id).getAs[Long]("pack") == cum / 64L)
      cum += byId(id).getAs[Long]("n_tok")
    }
  }

  test("plan: one exchange by shard, no global single-partition window") {
    val plan = Pack.packByBudget(corpus(1000), "doc_id", "n_tok",
      budget = 128L, shards = 4).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}

/** Shared scala-side replay of Sample.md5Rank32 for spec assertions. */
object SampleTestUtil {
  def rank32(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }
}

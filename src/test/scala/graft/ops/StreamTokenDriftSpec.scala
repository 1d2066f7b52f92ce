package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamTokenDriftSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // word-soup docs over a small vocabulary; ref = even ids; the "shift"
  // window appends heavy zzz-mass (OOV bucket) — the token_drift scenario
  private def corpus = {
    val words = Array("the", "cat", "dog", "sat", "mat", "ran", "big", "red")
    val r = new scala.util.Random(7)
    (0L until 300L).map(id => (id,
      Seq.fill(12)(words(r.nextInt(words.length))).mkString(" ")))
      .toDF("id", "text")
  }

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private val hour1 = new java.sql.Timestamp(base.getTime + 3600000L)

  private def stage(cur: org.apache.spark.sql.DataFrame, slices: Int): String = {
    val dir = Files.createTempDirectory("token-stage")
    val windows = Seq(
      base -> cur.select(col("text")),
      hour1 -> cur.select(concat(col("text"), lit(" zzz zzz zzz")).as("text")))
    var i = 0
    windows.foreach { case (ts, df) =>
      (0 until slices).foreach { s =>
        val tmp = Files.createTempDirectory("token-slice")
        df.filter(pmod(xxhash64(col("text")), lit(slices)) === s)
          .select(lit(ts).as("ts"), col("text"))
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val ls = Files.list(tmp)
        val part = try ls.filter(_.toString.endsWith(".parquet")).findFirst()
          finally ls.close()
        if (part.isPresent)
          Files.copy(part.get(), dir.resolve(f"f$i%03d.parquet"))
        i += 1
      }
    }
    dir.toString
  }

  test("streaming finals equal the batch PSI for both windows") {
    val c = corpus.cache()
    val ref = c.filter($"id" % 2 === 0)
    val cur = c.filter($"id" % 2 =!= 0)
    val vocab = Vocab.build(ref, "text", topN = 4)
    val refCounts = Vocab.bucketCountVector(ref, "text", vocab, topN = 4)
    val streamed = StreamingOps.runTokenDriftStream(spark, stage(cur, 1),
        vocab, refCounts, threshold = 0.05,
        queryName = s"st_${System.nanoTime()}")
      .select($"window_start", $"n", $"psi", $"is_drift")
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(streamed.size == 2)

    def batchOf(w: org.apache.spark.sql.DataFrame) = {
      val cc = Vocab.bucketCountVector(w, "text", vocab, topN = 4)
      (cc.sum, LatentDrift.psiFromCounts(refCounts, cc))
    }
    val (nSame, psiSame) = batchOf(cur)
    val (nShift, psiShift) =
      batchOf(cur.select(concat($"text", lit(" zzz zzz zzz")).as("text")))
    assert(streamed(base) == ((nSame, psiSame, psiSame > 0.05)), s"same ${streamed(base)}")
    assert(streamed(hour1) == ((nShift, psiShift, psiShift > 0.05)), s"shift ${streamed(hour1)}")
    assert(!streamed(base)._3 && streamed(hour1)._3, "scenario must separate")
  }

  test("micro-batch-boundary invariance: 3 slices per window == 1 slice") {
    val c = corpus.cache()
    val ref = c.filter($"id" % 2 === 0)
    val cur = c.filter($"id" % 2 =!= 0)
    val vocab = Vocab.build(ref, "text", topN = 4)
    val refCounts = Vocab.bucketCountVector(ref, "text", vocab, topN = 4)
    def finals(slices: Int) =
      StreamingOps.runTokenDriftStream(spark, stage(cur, slices), vocab,
          refCounts, threshold = 0.05, queryName = s"st_${System.nanoTime()}")
        .select($"window_start", $"n", $"psi", $"is_drift")
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val (a, b) = (finals(3), finals(1))
    assert(a.length == 2, s"expected 2 finals, got ${a.length}")
    assert(a.sameElements(b))
  }

  test("guards are loud") {
    val rows = Seq((base, "x")).toDF("ts", "text")
    val vocab = Seq(("x", 1)).toDF("token", "rank")
    assert(intercept[IllegalArgumentException](StreamingOps.tokenDriftPerWindow(
      rows, "text", vocab, Array.empty)).getMessage.contains("non-empty"))
  }
}

package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-on-ingest: good rows round-trip exactly, malformed and
  * missing-required rows quarantine WITH their raw line, blanks vanish —
  * one bad line costs one row, never the job and never a silent null. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  private def stage(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ingest-spec").toString
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("JSONL: valid rows parse, unparseable and missing-required lines " +
    "quarantine with the raw line, blanks are ignored") {
    val dir = stage(Seq(
      """{"doc_id":1,"lang":"en","n_chars":10}""",
      """{"doc_id":2,"lang":"de","n_chars":20}""",
      """{"doc_id":3,"lang"""",            // unparseable
      """{"lang":"xx","n_chars":5}""",     // parseable, doc_id missing
      "   ", ""))                          // blanks
    val r = Ingest.readJsonl(spark, dir, schema, required = Seq("doc_id"))
    val good = r.good.as[(Long, String, Long)].collect().sorted.toSeq
    assert(good == Seq((1L, "en", 10L), (2L, "de", 20L)))
    val bad = r.bad.as[String].collect().sorted.toSeq
    assert(bad == Seq("""{"doc_id":3,"lang"""", """{"lang":"xx","n_chars":5}"""))
  }

  test("JSONL: unparseable lines quarantine even with NO required fields " +
    "(corrupt sentinel, not struct nullness — from_json returns a " +
    "null-FIELDED struct on garbage)") {
    val dir = stage(Seq(
      """{"doc_id":1,"lang":"en","n_chars":10}""",
      """{"doc_id":3,"lang""""))
    val r = Ingest.readJsonl(spark, dir, schema) // required = empty
    assert(r.good.count() == 1)
    assert(r.bad.as[String].collect().toSeq == Seq("""{"doc_id":3,"lang""""))
  }

  test("JSONL: a wrong-TYPE field quarantines the row (PERMISSIVE marks " +
    "the record corrupt), required fields or not") {
    val dir = stage(Seq("""{"doc_id":"notanumber","lang":"en","n_chars":1}"""))
    val strict = Ingest.readJsonl(spark, dir, schema, required = Seq("doc_id"))
    assert(strict.good.count() == 0 && strict.bad.count() == 1)
    val lax = Ingest.readJsonl(spark, dir, schema)
    assert(lax.good.count() == 0 && lax.bad.count() == 1)
  }

  test("CSV: short rows and unclosed quotes quarantine under the required " +
    "check / corrupt sentinel; valid rows round-trip") {
    val dir = stage(Seq(
      "1,en,10",
      "2,de,20",
      "\"unclosed, quote",  // corrupt
      ",xx,5",              // empty required doc_id
      "   "))
    val r = Ingest.readCsv(spark, dir, schema, required = Seq("doc_id"))
    val good = r.good.as[(Long, String, Long)].collect().sorted.toSeq
    assert(good == Seq((1L, "en", 10L), (2L, "de", 20L)))
    assert(r.bad.count() == 2)
    // the gate never adds its corrupt sentinel to the good schema
    assert(!r.good.columns.contains("_corrupt"))
  }

  test("the same gate runs STREAMING: readStream over the landing zone " +
    "routes good and bad identically to the batch read") {
    val dir = stage(Seq(
      """{"doc_id":1,"lang":"en","n_chars":10}""",
      """{"doc_id":3,"lang"""",
      """{"doc_id":2,"lang":"de","n_chars":20}"""))
    val lines = spark.readStream.text(dir)
    val r = Ingest.splitJsonl(lines, schema, required = Seq("doc_id"))
    val tag = System.nanoTime()
    val qGood = r.good.writeStream.format("memory")
      .queryName(s"ingest_good_$tag").outputMode("append").start()
    val qBad = r.bad.writeStream.format("memory")
      .queryName(s"ingest_bad_$tag").outputMode("append").start()
    try {
      qGood.processAllAvailable(); qBad.processAllAvailable()
      val good = spark.table(s"ingest_good_$tag")
        .as[(Long, String, Long)].collect().sorted.toSeq
      assert(good == Seq((1L, "en", 10L), (2L, "de", 20L)))
      val bad = spark.table(s"ingest_bad_$tag").as[String].collect().toSeq
      assert(bad == Seq("""{"doc_id":3,"lang""""))
    } finally { qGood.stop(); qBad.stop() }
  }

  test("ingest is a narrow plan: no shuffle on either side of the split") {
    val dir = stage(Seq("""{"doc_id":1,"lang":"en","n_chars":10}"""))
    val r = Ingest.readJsonl(spark, dir, schema, required = Seq("doc_id"))
    Seq(r.good, r.bad).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1000))
    }
  }
}

package graft.model

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocsGenSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  lazy val specs = DocsGen.goldenScenario
  lazy val docs = DocsGen.docs(spark, 1800, specs).cache()

  test("row count and even part spread") {
    assert(docs.count() == 1800)
    val perPart = docs.groupBy("part").count().as[(Int, Long)].collect().toMap
    assert(perPart.size == specs.size)
    assert(perPart.values.forall(c => c == 100))
  }

  test("DocsGenFast is bit-identical to the expression generator (the spec)") {
    // every partition type of the golden scenario, every field, exact equality
    def dump(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"part", to_json($"spans").as("js"))
      .orderBy("doc_id", "js")
      .as[(String, Int, String)].collect()
    val a = dump(DocsGen.docs(spark, 3600, specs))
    val b = dump(DocsGenFast.docs(spark, 3600, specs))
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\n expr: $x\n fast: $y") }
  }

  test("generator is deterministic and parallelism-invariant") {
    // sort by full content: duplicated doc_ids (dup fixture part) tie otherwise
    val a = DocsGen.docs(spark, 300, specs)
      .select($"doc_id", to_json($"spans").as("js")).orderBy("doc_id", "js")
      .as[(String, String)].collect()
    val b = DocsGen.docs(spark, 300, specs).repartition(7)
      .select($"doc_id", to_json($"spans").as("js")).orderBy("doc_id", "js")
      .as[(String, String)].collect()
    assert(a.sameElements(b))
  }

  test("control part: unique doc_ids, strictly increasing offsets, no dangling kinds") {
    val p0 = docs.filter($"part" === 0)
    val n = p0.count()
    assert(p0.select("doc_id").distinct().count() == n)
    // offsets strictly increasing within each doc
    val bad = p0.filter(exists(
      zip_with(slice($"spans", lit(2), size($"spans") - 1),
        slice($"spans", lit(1), size($"spans") - 1),
        (b, a) => b.getField("offset") <= a.getField("offset")),
      x => x)).count()
    assert(bad == 0)
    val nullKinds = p0.select(explode($"spans").as("s"))
      .filter($"s.kind".isNull).count()
    assert(nullKinds == 0)
  }

  test("dup part has duplicate doc_ids; control parts do not") {
    val dupPart = specs.find(_.dupEvery > 1).get.part
    val p = docs.filter($"part" === dupPart)
    assert(p.select("doc_id").distinct().count() < p.count())
  }

  test("dangling part has media_refs outside the catalog") {
    val dangPart = specs.find(_.danglingRate > 0).get.part
    val media = DocsGen.media(spark, DocsGen.MediaCount)
    val refs = docs.filter($"part" === dangPart)
      .select(explode($"spans").as("s"))
      .filter($"s.media_ref".isNotNull)
      .select($"s.media_ref".as("media_ref"))
    val dangling = refs.join(media, Seq("media_ref"), "left_anti").count()
    assert(dangling > 0)
    // control part is referentially clean
    val cleanRefs = docs.filter($"part" === 0)
      .select(explode($"spans").as("s"))
      .filter($"s.media_ref".isNotNull)
      .select($"s.media_ref".as("media_ref"))
    assert(cleanRefs.join(media, Seq("media_ref"), "left_anti").count() == 0)
  }

  test("tilt parts shift kind mix toward image") {
    val kindFrac = (part: Int) => {
      val s = docs.filter($"part" === part).select(explode($"spans").as("s"))
      val total = s.count().toDouble
      s.filter($"s.kind" === "image").count() / total
    }
    val f0 = kindFrac(0)
    val f10 = kindFrac(10) // strongest tilt (1.6)
    assert(f10 > f0 + 0.15, s"tilted image frac $f10 vs control $f0")
  }

  test("swap parts break monotone offsets at increasing rates") {
    val violRate = (part: Int) => {
      val p = docs.filter($"part" === part)
      p.filter(exists(
        zip_with(slice($"spans", lit(2), size($"spans") - 1),
          slice($"spans", lit(1), size($"spans") - 1),
          (b, a) => b.getField("offset") <= a.getField("offset")),
        x => x)).count().toDouble / p.count()
    }
    assert(violRate(11) > 0.0)
    assert(violRate(14) > violRate(11))
  }

  test("featurize produces fixed-width normalized vectors") {
    val f = docs.select(DocsGen.featurize($"spans").as("f"))
    val rows = f.as[Seq[Double]].collect()
    assert(rows.forall(_.length == 6))
    assert(rows.forall(v => v.forall(x => !x.isNaN && x > -1 && x < 50)))
  }
}

package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Compiled imperative twin of [[DocsGen.docs]] — bit-identical output,
  * ~an order of magnitude cheaper to evaluate.
  *
  * The expression-based generator is the SPEC (pure column exprs, auditable
  * against the drift-ladder design); its higher-order lambdas evaluate
  * interpreted, which makes the 54M-doc bench input cost minutes of the
  * setup phase. This twin replays the identical arithmetic — Spark's own
  * XXH64 kernels with the same seed chaining (seed 42, then each operand in
  * order, exactly like the XxHash64 expression), the same 16-bit uniform
  * slices, Box–Muller, cut-points and format strings — inside mapPartitions.
  * DocsGenSpec asserts full-row equality against [[DocsGen.docs]]; any
  * divergence fails the build, so the twin can never drift from the spec.
  */
object DocsGenFast {

  case class GSpan(kind: String, text: String, media_ref: String, offset: Int)
  case class GDoc(doc_id: String, spans: Seq[GSpan], part: Int)

  private val SeedExpr = 42L // XxHash64 expression default seed
  private val vocab = Array(
    "drift", "batch", "window", "kernel", "latent", "vector", "span", "media",
    "offset", "detector", "sample", "sigma", "permute", "verdict", "schema",
    "sketch", "quantile", "anchor", "ledger", "mosaic", "quartz", "ember",
    "willow", "cobalt")

  @inline private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  private val tagCache = new java.util.concurrent.ConcurrentHashMap[String, UTF8String]()
  private def tag(s: String): UTF8String =
    tagCache.computeIfAbsent(s, UTF8String.fromString)

  /** xxhash64(id: long, tag: string, Seed: long) with expression seeding. */
  @inline private def h2(id: Long, t: String): Long = {
    var h = XXH64.hashLong(id, SeedExpr)
    h = hashStr(tag(t), h)
    XXH64.hashLong(DocsGen.Seed, h)
  }

  /** xxhash64(id: long, i: int, tag: string, Seed: long). */
  @inline private def h3(id: Long, i: Int, t: String): Long = {
    var h = XXH64.hashLong(id, SeedExpr)
    h = XXH64.hashInt(i, h)
    h = hashStr(tag(t), h)
    XXH64.hashLong(DocsGen.Seed, h)
  }

  @inline private def pmod(x: Long, m: Long): Long = { val r = x % m; if (r < 0) r + m else r }

  /** (pmod(hash, 1e6)+0.5)/1e6 — DocsGen.u */
  @inline private def u(id: Long, t: String): Double =
    (pmod(h2(id, t), 1000000L) + 0.5) / 1000000.0

  /** 16-bit slice b of a 64-bit hash — DocsGen.uBits */
  @inline private def uBits(h: Long, b: Int): Double =
    (((h >> (16 * b)) & 0xFFFFL) + 0.5) / 65536.0

  /** Box–Muller from two slices — DocsGen.gaussianBits */
  @inline private def gaussianBits(h: Long, b1: Int, b2: Int): Double =
    math.sqrt(-2.0 * math.log(math.max(uBits(h, b1), 1e-12))) *
      math.cos(2.0 * math.Pi * uBits(h, b2))

  /** Bit-identical twin of [[DocsGen.docs]] (see DocsGenSpec equality test). */
  def docs(spark: SparkSession, nDocs: Long, specs: Seq[PartSpec]): DataFrame = {
    import spark.implicits._
    val nParts = specs.size
    val specArr = specs.toArray
    spark.range(nDocs).as[Long].mapPartitions { it =>
      it.map { id =>
        val spec = specArr((id % nParts).toInt)
        val part = spec.part
        val lid = id / nParts
        val groupedLid = if (spec.dupEvery > 1) lid - lid % spec.dupEvery else lid
        val docId =
          if (spec.hotKeyFrac > 0.0 && u(id, "hot") < spec.hotKeyFrac) f"doc-$part%03d-hot"
          else f"doc-$part%03d-$groupedLid%09d"
        val nSpans = (1L + math.floor(u(id, "nspans") * 8)).toInt

        val total = 1.0 + spec.imageTilt
        val cutText = 0.70 / total
        val cutImage = (0.90 + spec.imageTilt) / total
        val cutAudio = (0.95 + spec.imageTilt) / total

        val spans = new Array[GSpan](nSpans)
        var off = 0
        var i = 0
        while (i < nSpans) {
          val hA = h3(id, i, "A")
          val hB = h3(id, i, "B")
          val hC = h3(id, i, "C")
          // gap → cumulative offset (expression: aggregate fold over gaps)
          val base = 5L + math.floor(uBits(hA, 0) * 20).toLong
          val gap = (if (spec.gapSigma == 0.0) math.max(1L, base)
            else math.max(1L,
              math.floor(base + spec.gapSigma * gaussianBits(hA, 1, 2) + 0.5).toLong)).toInt
          off += gap
          // swap corruption
          val offset =
            if (uBits(hB, 1) < spec.swapProb)
              math.max(0, off - (10L + math.floor(uBits(hB, 2) * 50).toLong).toInt)
            else off
          // kind
          val uk = uBits(hA, 3)
          val kind: String =
            if (uBits(hB, 0) < spec.nullKindRate) null
            else if (uk < cutText) "text"
            else if (uk < cutImage) "image"
            else if (uk < cutAudio) "audio"
            else "table"
          // text: 4 vocab words from hC slices
          val text: String =
            if (kind == "text") {
              val sb = new java.lang.StringBuilder(32)
              var b = 0
              while (b < 4) {
                if (b > 0) sb.append(' ')
                sb.append(vocab(pmod(hC >> (16 * b), vocab.length.toLong).toInt))
                b += 1
              }
              sb.toString
            } else null
          // media_ref for non-text, non-null kinds
          val mediaRef: String =
            if (kind != null && kind != "text") {
              if (uBits(hB, 3) < spec.danglingRate)
                f"m-${DocsGen.MediaCount + pmod(hC, 1000L)}%08d"
              else f"m-${pmod(hC, DocsGen.MediaCount)}%08d"
            } else null
          spans(i) = GSpan(kind, text, mediaRef, offset)
          i += 1
        }
        GDoc(docId, spans.toSeq, part)
      }
    }.toDF("doc_id", "spans", "part")
  }
}

package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** P40 HTML -> visible-text extraction: hand values over the full strip
  * surface, the documented entity-order laws, and the narrow-plan shape. */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def extract(s: String): String =
    Seq(Tuple1(s)).toDF("text")
      .select(TextOps.extractHtmlText($"text")).collect().head.getString(0)

  test("full template: comments, style, script (fake closer inside), tags, entities") {
    val html = "<html><head><title>T &amp; U</title>" +
      "<style media=\"all\">p { color: red; }</style>" +
      "<script type=\"text/javascript\">var x = 1 < 2 && \"</p>\";</script>" +
      "</head><body><!-- nav <p> skip --><h1>Doc &lt;#</h1><p>" +
      "hello world" +
      "</p><br>tail&nbsp;&amp;lt;end&#39;s&quot;</body></html>"
    assert(extract(html) == "T & U Doc <# hello world tail &lt;end's\"")
  }

  test("unclosed script/style openers drop their raw tail to EOF") {
    assert(extract("<p>keep</p><script>var leak = 'x';") == "keep")
    assert(extract("<p>keep</p><style>.leak { }") == "keep")
    // a PAIRED block followed by text keeps the text
    assert(extract("<script>a</script>after<style>b</style>now") == "after now")
  }

  test("entities decode AFTER stripping and one level only") {
    // &lt;script&gt; is content, not a strippable tag
    assert(extract("a &lt;script&gt;alert()&lt;/script&gt; b") ==
      "a <script>alert()</script> b")
    // double-encoded &amp;lt; yields literal &lt; (amp decodes last)
    assert(extract("&amp;lt;b&amp;gt;") == "&lt;b&gt;")
    assert(extract("x&apos;y &#39;z &quot;w &nbsp;v") == "x'y 'z \"w v")
  }

  test("plain text passes through modulo whitespace collapse; case-insensitive tags") {
    assert(extract("no markup  here\n at all") == "no markup here at all")
    assert(extract("<SCRIPT>x</SCRIPT><B>bold</B>") == "bold")
  }

  test("plan is a narrow projection: zero exchanges") {
    val df = Seq((1L, "<p>a</p>")).toDF("doc_id", "text")
      .select($"doc_id", TextOps.extractHtmlText($"text").as("t"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}

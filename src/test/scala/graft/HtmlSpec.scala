package graft

import graft.operators.Html
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Html]] — main-content extraction. The h1/cp8 oracle rows pin the
  * regex rules against DuckDB on the planted fixture; these cases pin the
  * SEMANTICS on handcrafted pages: what must vanish (head, scripts,
  * styles, comments, link-dense blocks), what must survive (paragraphs,
  * inline-link text, decoded entities), and robustness on inputs a crawl
  * actually serves (no markup at all, unclosed tags, empty string).
  */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def extract(html: String): (String, Long, Long) = {
    import spark.implicits._
    val r = Html.extract(Seq((1L, html)).toDF("id", "h"), "id", "h")
      .collect()(0)
    (r.getString(1), r.getLong(2), r.getLong(3))
  }

  test("head, script, style and comments vanish whole") {
    val (text, _, _) = extract(
      "<html><head><title>T</title><style>p{x}</style></head><body>" +
        "<script>var a='<p>not text</p>';</script>" +
        "<p>real content here</p><!-- secret --></body></html>")
    assert(text == "real content here")
  }

  test("link-dense blocks drop; paragraphs with an inline link survive") {
    val (text, nBlocks, nKept) = extract(
      "<body><div><a href='/'>Home</a> <a href='/a'>About</a></div>" +
        "<p>some prose with a <a href='/r'>single link</a> inside it</p>" +
        "<div><a>c</a> <a>p</a> <a>t</a></div></body>")
    assert(text == "some prose with a single link inside it")
    assert(nBlocks == 3L && nKept == 1L)
  }

  test("density boundary: exactly half link text is KEPT (2*lc <= vis)") {
    // visible "ab cd" (5 chars incl space), link text "ab" (2): 4 <= 5
    // -> kept; visible "abc x" (5) vs link "abc" (3): 6 > 5 -> dropped
    val (kept, _, _) = extract("<p><a>ab</a> cd</p>")
    assert(kept == "ab cd")
    val (dropped, _, _) = extract("<p><a>abc</a> x</p>")
    assert(dropped == "")
  }

  test("entities decode after tag stripping; &amp; decodes last") {
    val (text, _, _) = extract(
      "<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;&nbsp;e &amp;amp; f</p>")
    // &amp;amp; -> &amp; literally (single decode pass, & last)
    assert(text == "a <b> \"c\" 'd' e &amp; f")
  }

  test("plain text with no markup passes through collapsed") {
    val (text, nBlocks, nKept) = extract("no   tags\t at\n all")
    assert(text == "no tags at all" && nBlocks == 1L && nKept == 1L)
  }

  test("unclosed/malformed tags do not lose the surrounding text") {
    val (text, _, _) = extract("<p>before <b>bold text after</p>")
    assert(text == "before bold text after")
    val (t2, _, _) = extract("")
    assert(t2 == "")
  }

  test("nested inline tags inside an anchor count as link text") {
    // link text "bold link" (9 incl space, tag-stripped), visible
    // "bold link x" (11) -> 18 > 11 -> dropped
    val (text, _, _) = extract("<p><a><b>bold</b> link</a> x</p>")
    assert(text == "")
  }

  test("hrefs: double- and single-quoted attributes, fixed order") {
    import spark.implicits._
    val html = """<a href="/a">x</a> <b><a id='z' href='/b'>y</a></b>""" +
      """ <a name="n">no href</a>"""
    val got = Seq((1L, html)).toDF("id", "h")
      .select(graft.operators.Html.hrefs(col("h"))).collect()(0)
      .getSeq[String](0)
    assert(got == Seq("/a", "/b")) // all double-quoted first, then single
  }

  test("whitespace and case-insensitive tags: <P>/<DIV> split blocks") {
    val (text, _, nKept) = extract(
      "<BODY><P>first para</P><DIV><A>l</A><A>m</A></DIV><P>second</P></BODY>")
    assert(text == "first para second" && nKept == 2L)
  }
}

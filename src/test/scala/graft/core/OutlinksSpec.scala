package graft.core

import org.scalatest.funsuite.AnyFunSuite

class OutlinksSpec extends AnyFunSuite {
  import HtmlText.outlinks

  test("double/single/unquoted hrefs, document order") {
    val html =
      """<html><body>
        |<a href="https://a.com/1">one</a>
        |<a class='big' href='/rel/2'>two</a>
        |<a href=plain3.html rel=nofollow>three</a>
        |</body></html>""".stripMargin
    assert(outlinks(html).toSeq == Seq("https://a.com/1", "/rel/2", "plain3.html"))
  }

  test("attribute name case-insensitive; &amp; decoded; empty href dropped") {
    val html = """<a HREF="https://a.com/?x=1&amp;y=2">l</a><a href="">e</a>"""
    assert(outlinks(html).toSeq == Seq("https://a.com/?x=1&y=2"))
  }

  test("anchors in nav/footer ARE link-graph edges (unlike extract); comments are not") {
    val html =
      """<nav><a href="/">Home</a></nav>
        |<!-- <a href="/ghost">never</a> -->
        |<footer><a href="/legal">Legal</a></footer>""".stripMargin
    assert(outlinks(html).toSeq == Seq("/", "/legal"))
    assert(!HtmlText.extract(html).contains("Home")) // extract drops nav
  }

  test("href must be a standalone attribute token (not a substring match)") {
    val html = """<a data-href="/fake" href="/real">x</a><a nohref>y</a>"""
    assert(outlinks(html).toSeq == Seq("/real"))
  }

  test("closing </a> tags and non-anchor tags contribute nothing; malformed tail safe") {
    assert(outlinks("""<p href="/not-anchor">t</p></a><a href""").toSeq == Seq.empty)
    assert(outlinks("""<a href="/ok">x</a><a href="/unclosed""").toSeq == Seq("/ok"))
  }

  test("wrap()'s generated pages expose their nav links") {
    val html = new String(HtmlText.wrap("https://e.org/p", "T", "body text"), "UTF-8")
    assert(outlinks(html).toSeq == Seq("/", "/about"))
  }

  test("anchors: text captured, inner markup stripped, whitespace collapsed, &amp; decoded") {
    val html =
      """<a href="https://a.com/1">Plain  text</a>
        |<a href="/2"><b>bold</b> and <i>ital</i></a>
        |<a href="/3">A &amp; B</a>
        |<a href="/4"></a>""".stripMargin
    assert(HtmlText.anchors(html).toSeq == Seq(
      ("https://a.com/1", "Plain text"), ("/2", "bold and ital"),
      ("/3", "A & B"), ("/4", "")))
  }

  test("anchors: unterminated anchor takes the rest; hrefs == outlinks on comment-free html") {
    assert(HtmlText.anchors("""<a href="/x">tail with <em>no</em> close""").toSeq ==
      Seq(("/x", "tail with no close")))
    val html =
      """<a href="https://a.com/1">one</a><a class='big' href='/rel/2'>two</a>
        |<a href=plain3.html rel=nofollow>three</a><a HREF="/c?x=1&amp;y=2">l</a>""".stripMargin
    assert(HtmlText.anchors(html).map(_._1).toSeq == outlinks(html).toSeq)
    assert(HtmlText.anchors(html).map(_._2).toSeq == Seq("one", "two", "three", "l"))
  }

  test("headMeta: canonical link and robots directives, all quoting forms") {
    val html =
      """<html><head><link rel=stylesheet href="/s.css">
        |<LINK REL="Canonical" HREF="https://ex.com/page?a=1&amp;b=2">
        |<link rel="canonical" href="https://ex.com/SECOND-ignored">
        |<meta name=viewport content="width=device-width">
        |<meta name="ROBOTS" content="NoIndex, nofollow ">
        |</head><body>x</body></html>""".stripMargin
    val m = HtmlText.headMeta(html)
    assert(m == HeadMeta("https://ex.com/page?a=1&b=2", noindex = true, nofollow = true))
  }

  test("headMeta: directives OR across tags; 'none' expands; comments skipped") {
    val html =
      """<meta name=robots content=nofollow>
        |<!-- <meta name=robots content=noindex> <link rel=canonical href=/no> -->
        |<meta name="robots" content="noarchive">""".stripMargin
    assert(HtmlText.headMeta(html) == HeadMeta("", noindex = false, nofollow = true))
    assert(HtmlText.headMeta("<meta name=robots content=none>") ==
      HeadMeta("", noindex = true, nofollow = true))
  }

  test("headMeta: absent metadata and empty/relless links are defaults") {
    assert(HtmlText.headMeta("<html><body>plain</body></html>") ==
      HeadMeta("", noindex = false, nofollow = false))
    assert(HtmlText.headMeta("""<link href="/x"><link rel=canonical href="">""") ==
      HeadMeta("", noindex = false, nofollow = false))
  }
}

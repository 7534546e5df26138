package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 semantics: group selection, longest-match precedence,
  * wildcards/anchors, and the classic idioms. */
class RobotsTxtSpec extends AnyFunSuite {

  private val robots =
    """# crawl policy
      |User-agent: GraftBot
      |Disallow: /private/
      |Allow: /private/pub*
      |Disallow: /*.pdf$
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  test("longest match wins; allow beats disallow on ties") {
    assert(RobotsTxt.allowed(robots, "graftbot", "/public/page"))
    assert(!RobotsTxt.allowed(robots, "GRAFTBOT", "/private/secret"))
    assert(RobotsTxt.allowed(robots, "GraftBot", "/private/pub7")) // longer allow
    assert(!RobotsTxt.allowed(robots, "GraftBot", "/doc/file.pdf"))
    assert(RobotsTxt.allowed(robots, "GraftBot", "/doc/file.pdfx")) // $ anchored
  }

  test("unmatched agents fall to the * group; no groups at all = allow") {
    assert(!RobotsTxt.allowed(robots, "OtherBot", "/anything"))
    assert(RobotsTxt.allowed("Sitemap: /s.xml", "any", "/x"))
  }

  test("consecutive user-agent lines share one group; non-rule keys keep it open") {
    val r =
      """User-agent: a
        |User-agent: b
        |Crawl-delay: 10
        |Disallow: /x
        |""".stripMargin
    assert(!RobotsTxt.allowed(r, "a", "/x/1"))
    assert(!RobotsTxt.allowed(r, "B", "/x/1"))
    assert(RobotsTxt.allowed(r, "c", "/x/1")) // no * group -> allow
  }

  test("empty Disallow matches nothing (allow-all idiom); exact group hides *") {
    val r =
      """User-agent: a
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(RobotsTxt.allowed(r, "a", "/deep/path"))
    assert(!RobotsTxt.allowed(r, "z", "/deep/path"))
  }

  test("mid-pattern wildcards and tie-breaking by pattern length") {
    val r =
      """User-agent: *
        |Disallow: /a/*/c
        |Allow: /a/b/*
        |""".stripMargin
    // '/a/b/c': disallow pattern '/a/*/c' (6 octets) vs allow '/a/b/*'
    // (6 octets) -> tie -> allow wins
    assert(RobotsTxt.allowed(r, "x", "/a/b/c"))
    assert(!RobotsTxt.allowed(r, "x", "/a/zz/c"))
  }

  test("star backtracking terminates on adversarial patterns") {
    val path = "/" + "a" * 200 + "b"
    assert(!RobotsTxt.matches("/*a*a*a*a*c", path))
    assert(RobotsTxt.matches("/*a*a*a*a*b$", path))
  }
}

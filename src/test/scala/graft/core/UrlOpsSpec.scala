package graft.core

import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  import UrlOps._

  test("scheme and host lowercase; path case preserved") {
    assert(normalize("HTTP://Example.COM/Path/File") == "http://example.com/Path/File")
  }

  test("default ports stripped, non-default kept") {
    assert(normalize("http://a.com:80/x") == "http://a.com/x")
    assert(normalize("https://a.com:443/x") == "https://a.com/x")
    assert(normalize("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(normalize("https://a.com:80/x") == "https://a.com:80/x") // 80 is not https default
  }

  test("fragment dropped; www stripped; trailing slash collapsed with root") {
    assert(normalize("https://www.a.com/p#section") == "https://a.com/p")
    assert(normalize("https://a.com/") == "https://a.com")
    assert(normalize("https://a.com") == "https://a.com")
    assert(normalize("https://a.com/p/") == "https://a.com/p")
  }

  test("tracking params dropped, survivors sorted, empty query removed") {
    assert(normalize("https://a.com/p?utm_source=x&utm_medium=y&id=3") == "https://a.com/p?id=3")
    assert(normalize("https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2")
    assert(normalize("https://a.com/p?fbclid=zzz") == "https://a.com/p")
    assert(normalize("https://a.com/p?gclid=1&q=t&ref=home") == "https://a.com/p?q=t")
  }

  test("the six crawl aliases of one page collapse to one canonical key") {
    val aliases = Seq(
      "HTTPS://WWW.Example.com/a/b/",
      "https://example.com:443/a/b",
      "https://www.example.com/a/b#top",
      "https://example.com/a/b?utm_campaign=spring",
      "https://example.com/a/b/",
      "https://example.com/a/b")
    assert(aliases.map(normalize).distinct == Seq("https://example.com/a/b"))
  }

  test("non-URL strings pass through (trimmed, fragment-stripped) — never invent structure") {
    assert(normalize("  not a url  ") == "not a url")
    assert(normalize("mailto:x@y.com") == "mailto:x@y.com")
  }

  test("host extraction strips any port and www") {
    assert(host("HTTP://WWW.A.com:8080/x?q=1") == "a.com")
    assert(host("https://b.co.uk/") == "b.co.uk")
    assert(host("not a url") == "")
  }

  test("registrable domain: multi-level public suffixes keep eTLD+1") {
    assert(registrableDomain("sub.example.co.uk") == "example.co.uk")
    assert(registrableDomain("a.b.example.com") == "example.com")
    assert(registrableDomain("example.com") == "example.com")
    assert(registrableDomain("deep.sub.site.ac.jp") == "site.ac.jp")
    // 'co.com' is not an embedded suffix rule: two labels
    assert(registrableDomain("x.foo.co.com") == "co.com")
    assert(domainOf("https://www.news.example.co.uk/art/1") == "example.co.uk")
  }

  test("PSL snapshot: suffixes beyond the old 7-entry heuristic") {
    // multi-level ccTLD families the r4 heuristic mis-grouped
    assert(registrableDomain("shop.example.com.au") == "example.com.au")
    assert(registrableDomain("x.firma.waw.pl") == "firma.waw.pl")
    assert(registrableDomain("a.b.example.gob.mx") == "example.gob.mx")
    assert(registrableDomain("www.city.shibuya.tokyo.jp") == "shibuya.tokyo.jp")
    // wildcard rule *.ck: any second level is a suffix...
    assert(registrableDomain("x.acme.ck") == "x.acme.ck")
    // ...EXCEPT the !www.ck exception (the government's own site)
    assert(registrableDomain("foo.www.ck") == "www.ck")
    // designated-city wildcard + exception pair in .jp
    assert(registrableDomain("x.ward.kawasaki.jp") == "x.ward.kawasaki.jp")
    assert(registrableDomain("sub.city.kawasaki.jp") == "city.kawasaki.jp")
    // private-section hosting: two Pages sites are two registrants
    assert(registrableDomain("alice.github.io") == "alice.github.io")
    assert(registrableDomain("www.alice.github.io") == "alice.github.io")
    assert(registrableDomain("blog.bob.blogspot.com") == "bob.blogspot.com")
    // US state + k12 layering
    assert(registrableDomain("www.jefferson.k12.oh.us") == "jefferson.k12.oh.us")
    // a public suffix with no registrant label stays total (identity)
    assert(registrableDomain("co.uk") == "co.uk")
    // IPs never get label-sliced
    assert(registrableDomain("192.168.0.1") == "192.168.0.1")
  }
}

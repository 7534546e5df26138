package graft.core

/** Public-suffix matching per the Mozilla Public Suffix List algorithm
  * (publicsuffix.org/list — public-domain data, published algorithm):
  *
  *   1. a rule matches a hostname when the rule's labels equal the
  *      hostname's right-most labels (`*` matches exactly one label);
  *   2. exception rules (`!` prefix) beat every other match — the public
  *      suffix is the exception rule minus its left-most label;
  *   3. among non-exception matches the rule with the MOST labels wins;
  *   4. if nothing matches, the prevailing rule is `*` (the bare TLD).
  *
  * The registrable domain ("eTLD+1") is the public suffix plus one more
  * label — the per-site key for domain caps, host grouping, and robots
  * scoping. Grouping `foo.co.uk` with `bar.co.uk` (what a naive
  * "keep two labels" rule does) merges unrelated registrants; grouping
  * `a.github.io` with `b.github.io` does the same, which is why the list
  * ships a private section and this snapshot includes its most common
  * hosting entries.
  *
  * DATA: the algorithm above is exact; the embedded rule table is a
  * CURATED SNAPSHOT of the list — every multi-level ICANN rule family
  * that web-crawl corpora hit at volume (uk/au/nz/jp incl. prefectures
  * and city wildcards+exceptions, br/in/cn/kr/za/tr/ua/il/pl/id/th/sg/
  * my/ph/vn/tw/hk, US states, CA provinces, the pure-wildcard ccTLDs)
  * plus prominent private-section hosting suffixes. Single-label TLDs
  * need no entry (rule 4). Production swaps [[rules]] for the full
  * published file — same algorithm, different data; the seam is one
  * `Set[String]`.
  */
object PublicSuffixes {

  /** Rule table in the list's own line syntax: plain rules, `*.` wildcard
    * rules, `!` exception rules. */
  private val ruleLines: Seq[String] = {
    val uk = Seq("ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
      "nhs.uk", "org.uk", "plc.uk", "police.uk", "*.sch.uk")
    val au = Seq("com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
      "id.au", "info.au", "conf.au", "oz.au", "act.au", "nsw.au", "nt.au",
      "qld.au", "sa.au", "tas.au", "vic.au", "wa.au")
    val nz = Seq("ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
      "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
      "org.nz", "parliament.nz", "school.nz")
    val jpCore = Seq("ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp",
      "lg.jp", "ne.jp", "or.jp")
    val jpPref = Seq("aichi", "akita", "aomori", "chiba", "ehime", "fukui",
      "fukuoka", "fukushima", "gifu", "gunma", "hiroshima", "hokkaido",
      "hyogo", "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima",
      "kanagawa", "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki",
      "nagano", "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa",
      "osaka", "saga", "saitama", "shiga", "shimane", "shizuoka", "tochigi",
      "tokushima", "tokyo", "tottori", "toyama", "wakayama", "yamagata",
      "yamaguchi", "yamanashi").map(_ + ".jp")
    // designated-city wildcards: wards/bureaus are separate registrants
    // (<x>.kawasaki.jp is a suffix) EXCEPT the city government itself
    val jpCities = Seq("kawasaki", "kitakyushu", "kobe", "nagoya", "sapporo",
      "sendai", "yokohama").flatMap(c => Seq(s"*.$c.jp", s"!city.$c.jp"))
    val br = Seq("com", "net", "org", "gov", "edu", "mil", "art", "adv",
      "blog", "eco", "emp", "eng", "esp", "far", "flog", "fm", "g12", "ind",
      "inf", "jor", "jus", "leg", "med", "mus", "nom", "not", "ntr", "odo",
      "pro", "psc", "psi", "rec", "slg", "srv", "tmp", "trd", "tur", "tv",
      "vet", "vlog", "wiki", "zlg").map(_ + ".br")
    val in = Seq("co", "net", "org", "firm", "gen", "ind", "nic", "ac",
      "edu", "res", "gov", "mil").map(_ + ".in")
    val cn = (Seq("ac", "com", "edu", "gov", "mil", "net", "org") ++
      Seq("ah", "bj", "cq", "fj", "gd", "gs", "gz", "gx", "ha", "hb", "he",
        "hi", "hl", "hn", "jl", "js", "jx", "ln", "nm", "nx", "qh", "sc",
        "sd", "sh", "sn", "sx", "tj", "xj", "xz", "yn", "zj", "hk", "mo",
        "tw")).map(_ + ".cn")
    val kr = (Seq("ac", "co", "es", "go", "hs", "kg", "mil", "ms", "ne",
      "or", "pe", "re", "sc") ++
      Seq("busan", "chungbuk", "chungnam", "daegu", "daejeon", "gangwon",
        "gwangju", "gyeongbuk", "gyeonggi", "gyeongnam", "incheon", "jeju",
        "jeonbuk", "jeonnam", "seoul", "ulsan")).map(_ + ".kr")
    val za = Seq("ac", "co", "edu", "gov", "law", "mil", "net", "nom",
      "org", "school", "web").map(_ + ".za")
    val misc = Seq(
      "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
      "com.ar", "net.ar", "org.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
      "musica.ar", "tur.ar", "edu.ar",
      "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "av.tr",
      "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr", "name.tr",
      "pol.tr", "tel.tr", "tv.tr", "web.tr",
      "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
      "kyiv.ua", "kharkiv.ua", "lviv.ua", "odessa.ua",
      "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
      "org.il",
      "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "art.pl", "biz.pl",
      "info.pl", "mail.pl", "media.pl", "mil.pl", "nom.pl", "shop.pl",
      "sklep.pl", "waw.pl", "warszawa.pl", "wroclaw.pl", "krakow.pl",
      "poznan.pl", "gdansk.pl", "lodz.pl",
      "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
      "net.id", "or.id", "sch.id", "web.id",
      "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
      "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
      "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
      "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "org.ph", "ngo.ph",
      "i.ph",
      "com.vn", "edu.vn", "gov.vn", "net.vn", "org.vn", "ac.vn", "biz.vn",
      "health.vn", "info.vn", "int.vn", "name.vn", "pro.vn",
      "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
      "club.tw", "ebiz.tw", "game.tw",
      "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
      "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
      "mobi.ke", "info.ke",
      "com.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng",
      "net.ng", "org.ng", "sch.ng", "i.ng",
      "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg", "net.eg",
      "org.eg", "sci.eg",
      "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa", "edu.sa",
      "sch.sa",
      "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
      "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
      "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk", "fam.pk", "biz.pk",
      "web.pk", "gob.pk", "gok.pk", "gop.pk", "gos.pk",
      "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
      "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
      "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
      "yk.ca")
    // ccTLDs whose second level is entirely delegated: every 2-label
    // suffix is public; .ck carves out the government's own site
    val pureWildcards = Seq("*.bd", "*.ck", "!www.ck", "*.er", "*.fk",
      "*.jm", "*.kh", "*.mm", "*.np", "*.pg")
    val usStates = Seq("ak", "al", "ar", "az", "ca", "co", "ct", "dc", "de",
      "fl", "ga", "gu", "hi", "ia", "id", "il", "in", "ks", "ky", "la",
      "ma", "md", "me", "mi", "mn", "mo", "ms", "mt", "nc", "nd", "ne",
      "nh", "nj", "nm", "nv", "ny", "oh", "ok", "or", "pa", "pr", "ri",
      "sc", "sd", "tn", "tx", "ut", "va", "vi", "vt", "wa", "wi", "wv",
      "wy")
    val us = usStates.flatMap(st =>
      Seq(s"$st.us", s"k12.$st.us", s"cc.$st.us", s"lib.$st.us"))
    // private section: multi-registrant hosting platforms — two GitHub
    // Pages sites are different publishers and must not share a
    // registrable-domain key
    val priv = Seq("github.io", "githubusercontent.com", "gitlab.io",
      "blogspot.com", "wordpress.com", "appspot.com", "herokuapp.com",
      "netlify.app", "vercel.app", "pages.dev", "workers.dev", "web.app",
      "firebaseapp.com", "azurewebsites.net", "cloudfront.net",
      "s3.amazonaws.com", "*.compute.amazonaws.com", "weebly.com",
      "wixsite.com", "neocities.org", "readthedocs.io", "onrender.com",
      "fly.dev", "deno.dev", "glitch.me", "repl.co", "tumblr.com")
    uk ++ au ++ nz ++ jpCore ++ jpPref ++ jpCities ++ br ++ in ++ cn ++
      kr ++ za ++ misc ++ pureWildcards ++ us ++ priv
  }

  /** Plain rules (exact label-sequence suffixes). */
  private val rules: Set[String] =
    ruleLines.filterNot(l => l.startsWith("*.") || l.startsWith("!")).toSet
  /** Wildcard rules, stored WITHOUT the `*.` — `*.ck` is stored as `ck`
    * and matches any host whose tail after one label equals it. */
  private val wildcards: Set[String] =
    ruleLines.collect { case l if l.startsWith("*.") => l.substring(2) }.toSet
  /** Exception rules, stored without the `!`. */
  private val exceptions: Set[String] =
    ruleLines.collect { case l if l.startsWith("!") => l.substring(1) }.toSet

  private def isIpv4(host: String): Boolean = {
    val ls = host.split('.')
    ls.length == 4 && ls.forall(l =>
      l.nonEmpty && l.length <= 3 && l.forall(_.isDigit) && l.toInt <= 255)
  }

  /** The public suffix of `host` (lowercase hostname, no port). Returns the
    * bare TLD when no rule matches (prevailing rule `*`), and `host`
    * itself for empty/IP inputs. */
  def publicSuffix(host: String): String = {
    if (host.isEmpty || isIpv4(host)) return host
    val labels = host.split('.')
    val n = labels.length
    // scan suffixes longest-first: the first rule hit IS the most-labels
    // match (rule 3), and exceptions are checked before wildcards at each
    // length so `!city.kawasaki.jp` beats `*.kawasaki.jp` (rule 2)
    var i = 0
    while (i < n) {
      val suffix = labels.drop(i).mkString(".")
      if (exceptions.contains(suffix))
        return labels.drop(i + 1).mkString(".")
      if (rules.contains(suffix)) return suffix
      if (i + 1 < n && wildcards.contains(labels.drop(i + 1).mkString(".")))
        return suffix
      i += 1
    }
    labels(n - 1)
  }

  /** Registrable domain (eTLD+1). When the host IS a public suffix (or an
    * IP / not a hostname) there is no registrant — the host itself is
    * returned, which keeps grouping keys total and stable. */
  def registrableDomain(host: String): String = {
    if (host.isEmpty || isIpv4(host)) return host
    val ps = publicSuffix(host)
    if (ps.length >= host.length) return host
    val labels = host.split('.')
    val psLabels = ps.count(_ == '.') + 1
    labels.takeRight(psLabels + 1).mkString(".")
  }
}

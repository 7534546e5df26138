package graft.core

/** robots.txt evaluation (RFC 9309, public spec) — the crawl-side gate a
  * Common-Crawl-style pipeline applies before a page ever reaches the
  * corpus. Implemented as a pure kernel so fetch-policy checks run as a
  * map-only column over (robots_content, agent, path) — the content rides
  * a per-host broadcast or a host-keyed join at scale, never a
  * per-request fetch.
  *
  * Semantics implemented (RFC 9309 §2):
  *  - groups: consecutive `User-agent:` lines open a group; `Allow:` /
  *    `Disallow:` lines belong to the open group; other keys (crawl-delay,
  *    sitemap) are ignored but do NOT close a group (§2.2.1);
  *  - agent selection: all groups whose user-agent token equals the
  *    product token case-insensitively are combined; if none match, all
  *    `*` groups combine; if neither exists, everything is allowed;
  *  - rule match: case-sensitive octet prefix match on the path with `*`
  *    (any chars) and `$` (end anchor) wildcards (§2.2.3);
  *  - precedence: the longest-pattern match wins; on a tie or an
  *    equal-length allow/disallow conflict, allow wins (§2.2.2);
  *  - an empty `Disallow:` value matches nothing (the classic
  *    "Disallow:" = allow-all idiom); unparsable lines are skipped.
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** Rules applicable to `agent`, in file order. */
  def rulesFor(content: String, agent: String): Seq[Rule] = {
    val agentLc = agent.toLowerCase
    val exact = scala.collection.mutable.ArrayBuffer[Rule]()
    val star = scala.collection.mutable.ArrayBuffer[Rule]()
    // state: which buffers the open group feeds (none / star / exact / both)
    var feedExact = false
    var feedStar = false
    var inAgentRun = false // consecutive user-agent lines accumulate
    // a PRESENT exact-agent group hides the * groups even when all its
    // rules are empty-valued (the "Disallow:" allow-all idiom leaves the
    // group rule-less but selected)
    var sawExact = false
    content.split("\n").foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) { feedExact = false; feedStar = false; inAgentRun = true }
            if (value == "*") feedStar = true
            else if (value.toLowerCase == agentLc) { feedExact = true; sawExact = true }
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) { // empty Disallow matches nothing
              val r = Rule(key == "allow", value)
              if (feedExact) exact += r
              if (feedStar) star += r
            }
          case _ => inAgentRun = false // crawl-delay etc.: group stays open
        }
      }
    }
    if (sawExact) exact.toSeq else star.toSeq
  }

  /** Octet prefix match with `*` / terminal `$`. Unanchored patterns are
    * prefix matches, i.e. a FULL match of `pattern + "*"` — evaluated
    * with the classic greedy single-backtrack-point wildcard scan, O(n·m)
    * worst case (naive recursion is exponential in the star count, and
    * robots files are adversarial input). */
  private[core] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat0 = if (anchored) pattern.dropRight(1) else pattern
    val pat = if (anchored) pat0 else pat0 + "*"
    var s = 0
    var p = 0
    var star = -1
    var ss = 0
    while (s < path.length) {
      if (p < pat.length && pat.charAt(p) == '*') { star = p; p += 1; ss = s }
      else if (p < pat.length && pat.charAt(p) == path.charAt(s)) { p += 1; s += 1 }
      else if (star >= 0) { p = star + 1; ss += 1; s = ss }
      else return false
    }
    while (p < pat.length && pat.charAt(p) == '*') p += 1
    p == pat.length
  }

  /** Is `path` fetchable for `agent` under this robots.txt? */
  def allowed(content: String, agent: String, path: String): Boolean = {
    val rules = rulesFor(content, agent)
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }
}

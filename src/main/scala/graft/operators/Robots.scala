package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate a
  * responsible corpus pipeline applies before a page may enter the
  * training set (and retroactively, when re-filtering an existing crawl
  * against current robots snapshots).
  *
  * Semantics implemented per the RFC: groups are selected by the MOST
  * SPECIFIC matching user-agent line (longest product-token match; `*`
  * is the least specific fallback), adjacent user-agent lines share one
  * group, rules match as case-sensitive path prefixes with `*` (any
  * sequence) and `$` (end anchor) wildcards, the MOST SPECIFIC rule wins
  * (longest pattern), and on an exact tie `allow` beats `disallow`. An
  * empty `Disallow:` matches nothing; no matching rule means allowed;
  * an unparseable or missing robots file allows everything (the RFC's
  * "unavailable" stance for 4xx).
  *
  * Parsing + evaluation are pure per-row functions behind the
  * mapPartitions seam: zero shuffle, rows in/rows out.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Seq[String], rules: Seq[Rule])

  /** All groups of a robots.txt body, in file order. Lines that aren't
    * `field: value` (comments, blanks, junk) are skipped; unknown fields
    * (crawl-delay, sitemap) end the "adjacent user-agent lines" run but
    * are otherwise ignored, per the RFC's forward-compat rule. */
  def parse(content: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var inAgentRun = false
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty; rules = Vector.empty
    }
    content.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val field = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgentRun) flush()
            agents :+= value.toLowerCase
            inAgentRun = true
          case "allow" | "disallow" =>
            inAgentRun = false
            if (agents.nonEmpty)
              rules :+= Rule(field == "allow", value)
          case _ => inAgentRun = false
        }
      }
    }
    flush()
    groups.result()
  }

  /** Pattern match per RFC 9309: literal prefix with `*` = any sequence,
    * trailing `$` = end anchor. Greedy backtracking over the (few) stars. */
  def patternMatches(pattern: String, path: String): Boolean = {
    val (pat0, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    // '**' ≡ '*': collapsing star runs removes the empty middle segments
    // whose zero-width matches would make backtracking exponential on
    // adversarial patterns (fuzz-pinned in CodecFuzzSpec)
    val pat = pat0.replaceAll("\\*{2,}", "*")
    val parts = pat.split("\\*", -1)
    def go(segIdx: Int, pos: Int): Boolean = {
      if (segIdx == parts.length)
        return !anchored || pos == path.length
      val seg = parts(segIdx)
      if (segIdx == 0) {
        if (!path.startsWith(seg)) false
        else go(1, seg.length)
      } else if (segIdx == parts.length - 1 && anchored) {
        // last segment must END the path
        path.length - seg.length >= pos && path.endsWith(seg)
      } else if (segIdx == parts.length - 1 && seg.isEmpty) {
        true // trailing unanchored '*' matches the rest
      } else {
        var at = path.indexOf(seg, pos)
        while (at >= 0) {
          if (go(segIdx + 1, at + seg.length)) return true
          at = path.indexOf(seg, at + 1)
        }
        false
      }
    }
    go(0, 0)
  }

  /** Rules governing `agent`: the longest user-agent token that is a
    * prefix of (or equal to) the agent product token wins (the
    * most-specific rule crawlers document), `*` is the fallback, and —
    * per the RFC's combination rule — ALL groups naming the winning
    * token contribute their rules. */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val a = agent.toLowerCase
    val named = for {
      g <- groups; ua <- g.agents
      if ua != "*" && (a == ua || a.startsWith(ua))
    } yield (ua, g)
    if (named.nonEmpty) {
      val best = named.map(_._1.length).max
      named.collect { case (ua, g) if ua.length == best => g }
        .distinct.flatMap(_.rules)
    } else groups.filter(_.agents.contains("*")).flatMap(_.rules)
  }

  /** Allowed iff the governing rules' most specific match is an allow
    * (longest pattern wins; tie → allow; no match / no group → allowed).
    * Empty patterns never match. */
  def isAllowed(content: String, agent: String, path: String): Boolean = {
    val rules = rulesFor(parse(content), agent)
    val hits = rules.filter(r =>
      r.pattern.nonEmpty && patternMatches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.pattern.length).max
      hits.filter(_.pattern.length == best).exists(_.allow)
    }
  }

  final case class RobotsVerdict(media_id: Long, path: String,
    allowed: Boolean)

  final case class PageFetch(media_id: Long, robots: String, path: String)

  /** Partition-parallel politeness gate: (robots body, path) rows in,
    * verdicts out — compose with `.filter(col("allowed"))`. */
  def evaluate(pages: Dataset[PageFetch], agent: String)(
      implicit spark: SparkSession): Dataset[RobotsVerdict] = {
    import spark.implicits._
    pages.mapPartitions(rows => rows.map(p =>
      RobotsVerdict(p.media_id, p.path, isAllowed(p.robots, agent, p.path))))
  }
}

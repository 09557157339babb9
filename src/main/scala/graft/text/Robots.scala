package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation for crawl-corpus provenance filtering: which of
  * the corpus URLs was the crawler actually allowed to fetch? The grammar
  * is the RFC 9309 prefix subset (no `*`/`$` wildcards — the overwhelming
  * majority of real rules): groups are maximal runs of `User-agent` lines
  * followed by `Allow`/`Disallow` lines; `#` comments stripped; agent names
  * case-insensitive; an empty rule path is a no-op and is dropped.
  *
  * Verdict semantics (Google/RFC): the group for the EXACT agent applies
  * when the host has one, else the `*` group; within the group the
  * longest-prefix match wins, `Allow` beats `Disallow` on equal length;
  * no matching rule — or no applicable group — means allowed.
  *
  * Scale shape: parsing is a per-host window over exploded lines (robots
  * files are KB-bounded, so per-host state is tiny), evaluation is ONE
  * host-key equi-join from URLs to the parsed rule relation (rules per
  * host are bounded, so the fan-out is a small constant) followed by a
  * per-URL-row window over the handful of matching rules. Nothing is
  * collected; skew follows host popularity and is AQE-splittable. */
object Robots {

  /** robots.txt contents → one row per (host, agent, rule):
    * (host, agent, allow, prefix). A group listing several user agents
    * emits its rules once per agent. */
  def parseRules(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame = {
    val lines = robots
      .select(col(hostCol).as("__host"),
        posexplode(split(col(txtCol), "\n")).as(Seq("__idx", "__raw")))
      .select(col("__host"), col("__idx"),
        regexp_replace(regexp_replace(col("__raw"), "#.*", ""),
          "^\\s+|\\s+$", "").as("__line"))
    val tagged = lines.select(col("__host"), col("__idx"),
      lower(regexp_extract(col("__line"), "(?i)^user-agent:\\s*(\\S+)", 1))
        .as("__ua"),
      lower(regexp_extract(col("__line"), "(?i)^(allow|disallow):", 1))
        .as("__dir"),
      regexp_extract(col("__line"), "(?i)^(?:allow|disallow):\\s*(\\S+)", 1)
        .as("__prefix"))
    val w = Window.partitionBy("__host").orderBy("__idx")
    val grouped = tagged
      .withColumn("__is_ua", col("__ua") =!= "")
      .withColumn("__prev_ua",
        coalesce(lag(col("__is_ua"), 1).over(w), lit(false)))
      .withColumn("__grp",
        sum(when(col("__is_ua") && !col("__prev_ua"), 1).otherwise(0)).over(w))
    val agents = grouped.filter(col("__is_ua"))
      .select(col("__host"), col("__grp"), col("__ua").as("agent"))
    val dirs = grouped.filter(col("__dir") =!= "" && col("__prefix") =!= "")
      .select(col("__host"), col("__grp"),
        (col("__dir") === "allow").as("allow"), col("__prefix").as("prefix"))
    agents.join(dirs, Seq("__host", "__grp"))
      .select(col("__host").as("host"), col("agent"), col("allow"),
        col("prefix"))
  }

  /** Path+query of `url` as the robots matcher sees it ("/" when empty). */
  def urlPath(url: Column): Column = {
    val p = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    when(p === "", "/").otherwise(p)
  }

  /** Per-URL verdict for `agent` against parsed `rules` (from
    * [[parseRules]]): all `urls` columns pass through, plus `allowed` and
    * `rule` ("allow:<prefix>" / "disallow:<prefix>" of the winning rule,
    * "" when no rule matched). */
  def evaluate(urls: DataFrame, urlCol: String, rules: DataFrame,
      agent: String): DataFrame = {
    val a = agent.toLowerCase
    val r = rules.filter(col("agent") === a || col("agent") === "*")
    // RFC group selection: the exact-agent group REPLACES '*' per host
    val hostHasSpecific = r.filter(col("agent") === a)
      .select(col("host")).distinct().withColumn("__has_specific", lit(true))
    val applicable = r.join(hostHasSpecific, Seq("host"), "left")
      .filter(when(coalesce(col("__has_specific"), lit(false)),
        col("agent") === a).otherwise(col("agent") === "*"))
      .select(col("host").as("__rhost"), col("allow"), col("prefix"))
    // __rowid is assigned in the projection BEFORE the join, so every
    // fanned-out candidate of one URL row shares it — it exists only to
    // key the per-row winner window and is dropped on output
    val keyed = urls
      .withColumn("__host", Web.host(col(urlCol)))
      .withColumn("__path", urlPath(col(urlCol)))
      .withColumn("__rowid", monotonically_increasing_id())
    val cand = keyed.join(applicable,
      keyed("__host") === applicable("__rhost") &&
        startswith(keyed("__path"), applicable("prefix")), "left")
    val w = Window.partitionBy("__rowid")
      .orderBy(length(col("prefix")).desc, col("allow").desc,
        col("prefix").asc)
    cand.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .withColumn("allowed", coalesce(col("allow"), lit(true)))
      .withColumn("rule", when(col("prefix").isNull, lit(""))
        .otherwise(concat(when(col("allow"), lit("allow:"))
          .otherwise(lit("disallow:")), col("prefix"))))
      .drop("__host", "__path", "__rowid", "__rhost", "__rn", "allow",
        "prefix")
  }

  // ------------------------------------------------------ pure twins -------

  /** Pure twin of [[parseRules]] for one file: (agent, allow, prefix).
    * Uses find-at-start matching (not full-line), exactly like
    * `regexp_extract` in the Column form. */
  def parse(txt: String): Seq[(String, Boolean, String)] = {
    val lines = txt.split("\n", -1).toSeq
      .map(_.replaceAll("#.*", "").replaceAll("^\\s+|\\s+$", ""))
    val ua = java.util.regex.Pattern.compile("(?i)^user-agent:\\s*(\\S+)")
    val dir = java.util.regex.Pattern.compile("(?i)^(allow|disallow):\\s*(\\S+)")
    var grp = 0
    var prevUa = false
    val tagged = lines.map { l =>
      val um = ua.matcher(l)
      val agent = if (um.find()) um.group(1).toLowerCase else ""
      if (agent.nonEmpty && !prevUa) grp += 1
      prevUa = agent.nonEmpty
      val dm = dir.matcher(l)
      val (allow, prefix) =
        if (dm.find()) (dm.group(1).equalsIgnoreCase("allow"), dm.group(2))
        else (false, "")
      (grp, agent, allow, prefix)
    }
    val agents = tagged.collect { case (g, ag, _, _) if ag.nonEmpty => (g, ag) }
    val rules = tagged.collect { case (g, ag, al, p) if ag.isEmpty && p.nonEmpty =>
      (g, al, p)
    }
    for ((g, name) <- agents; (rg, allow, p) <- rules if g == rg)
      yield (name, allow, p)
  }

  /** Pure twin of [[evaluate]] for one parsed file:
    * (allowed, winning rule or ""). */
  def isAllowed(rules: Seq[(String, Boolean, String)], agent: String,
      path: String): (Boolean, String) = {
    val a = agent.toLowerCase
    val hasSpecific = rules.exists(_._1 == a)
    val applicable = rules.filter(r => r._1 == (if (hasSpecific) a else "*"))
    val matching = applicable.filter(r => path.startsWith(r._3))
    if (matching.isEmpty) (true, "")
    else {
      val (_, allow, p) = matching
        .minBy { case (_, al, pf) => (-pf.length, !al, pf) }
      (allow, (if (allow) "allow:" else "disallow:") + p)
    }
  }
}

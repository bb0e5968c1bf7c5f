package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Web-crawl curation operators — the URL-level stages every large
  * crawl-derived training corpus runs before any text-level filtering
  * (C4: Raffel et al. 2020 §2.2; CCNet: Wenzek et al. 2020; RefinedWeb:
  * Penedo et al. 2023 §3.1, which dedups and caps on the *canonical* URL
  * and the *registrable domain* respectively):
  *
  *  - URL canonicalization (scheme/host case, default ports, fragments,
  *    tracking parameters, parameter order, trailing slashes) so that
  *    the same page fetched twice maps to one key,
  *  - registrable-domain extraction against a public-suffix list (the
  *    PSL's private section is why `foo.blogspot.com`-style hosts are
  *    their own registrable domain — modeled here by passing the
  *    multi-label suffixes in),
  *  - per-domain document caps (RefinedWeb-style anti-spam: no single
  *    site dominates the corpus), and
  *  - domain blocklist filtering (broadcast anti-join).
  *
  * Everything except the cap is a pure per-row projection built from
  * codegen'd string functions — zero shuffles, linear at any scale. The
  * cap is one shuffle on the domain key; the blocklist is a broadcast
  * anti-join (blocklists are KB–MB sized). The reference's message log
  * has no web layer at all; this family is part of the SURVEY §2
  * "beyond the reference" training-pipeline mandate.
  */
object Web {

  /** Tracking parameters dropped during canonicalization: the
    * `utm_*` family plus the click-id params, per the public lists that
    * crawl pipelines ship (anchored regex over the `k=v` token). */
  val TrackingParamRe = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** Everything after the FIRST `://` (RFC 3986: the scheme separator
    * is the first one — crawl URLs routinely carry another URL in the
    * query, e.g. `...?to=http://other.site/p`, and a last-occurrence
    * split would parse against the EMBEDDED host). Shared by
    * [[normalizeUrl]] and [[hostOf]] so the two can never key the same
    * document differently. */
  private def restOf(url: Column): Column =
    when(instr(url, "://") > 0,
      url.substr(instr(url, "://") + lit(3), length(url)))
      .otherwise(url)

  /** `host[:port]` = the rest up to the first `/`, `?`, or `#`. */
  private def hostportOf(rest: Column): Column =
    substring_index(substring_index(substring_index(rest, "/", 1), "?", 1), "#", 1)

  /** hostport → host: lowercased, `www.` stripped, `:port` removed. */
  private def hostFromHostport(hostport: Column): Column =
    regexp_replace(lower(substring_index(hostport, ":", 1)), "^www\\.", "")

  /** Canonical URL: lowercase scheme and host, `www.` prefix stripped,
    * default port dropped (`:80` for http, `:443` for https; any other
    * port kept), fragment dropped (first `#`), tracking params dropped,
    * remaining query params sorted bytewise, trailing slash runs
    * trimmed from the path. The query is everything after the FIRST
    * `?` (RFC 3986 — `?` is legal inside query values, so a
    * last-occurrence split would silently truncate multi-`?` queries
    * and collapse distinct pages to one key). Pure string-function
    * projection — no UDF, no shuffle; the whole thing inlines into the
    * scan's projection at 100 TB. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(substring_index(url, "://", 1))
    val rest = restOf(url)
    val hostport = hostportOf(rest)
    val tail = rest.substr(length(hostport) + lit(1), length(rest))
    val noFrag = substring_index(tail, "#", 1)
    val path = substring_index(noFrag, "?", 1)
    val rawQuery =
      when(instr(noFrag, "?") > 0,
        noFrag.substr(instr(noFrag, "?") + lit(1), length(noFrag)))
        .otherwise(lit(""))
    val host = hostFromHostport(hostport)
    val port =
      when(instr(hostport, ":") > 0, substring_index(hostport, ":", -1)).otherwise(lit(""))
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val params = filter(
      split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val cleanQuery = array_join(sort_array(params), "&")
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      regexp_replace(path, "/+$", ""),
      when(cleanQuery =!= "", concat(lit("?"), cleanQuery)).otherwise(lit("")))
  }

  /** Host of a URL, lowercased, `www.` stripped, port removed — the key
    * [[registrableDomain]] expects. Pure projection, built from the
    * same first-`://` pieces as [[normalizeUrl]]. */
  def hostOf(url: Column): Column =
    hostFromHostport(hostportOf(restOf(url)))

  /** Registrable domain (eTLD+1) of a host against a suffix list: the
    * longest listed suffix that the host ends on, plus one more label.
    * `suffixes` carries the multi-label entries (both ICANN `co.uk`-style
    * and PSL-private `example.com`-style, which is how `*.blogspot.com`
    * sites become separate registrable domains); single-label TLDs are
    * the implicit fallback. Suffixes are compile-time literals, so the
    * whole match is a codegen'd CASE over `element_at(split(host))` —
    * still a pure projection, no join against the list. */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)
    val byDepth = suffixes.groupBy(_.count(_ == '.') + 1).toSeq.sortBy(-_._1)
    val fallback = when(n >= 2, lastK(2)).otherwise(host)
    byDepth.foldRight(fallback) { case ((depth, sfx), acc) =>
      when(n >= depth + 1 && lastK(depth).isin(sfx: _*), lastK(depth + 1))
        .otherwise(acc)
    }
  }

  /** Keep at most `n` rows per domain, ranked by `order` (ties must be
    * broken by a unique key for determinism). One shuffle on the domain
    * key; at 100 TB a hot mega-domain lands in one task, which AQE's
    * skew split cannot divide (row_number needs the whole partition) —
    * the mitigation is the same two-phase trick as top-k: a per-shard
    * pre-cap to `n` with the same ordering is lossless (a row outside
    * its shard's top-n cannot be in the domain's top-n), so callers at
    * extreme skew pre-filter with `perDomainCap` over `(domain,
    * shard_salt)` first, shrinking the hot key to `n × shards` rows. */
  def perDomainCap(
      df: DataFrame,
      domainCol: String,
      n: Int,
      order: Seq[Column]): DataFrame =
    df.withColumn(
        "rn",
        row_number().over(Window.partitionBy(col(domainCol)).orderBy(order: _*)))
      .filter(col("rn") <= n)

  /** Path component of a URL: everything after `host[:port]` up to the
    * first `?` or `#`; an empty path reads as `/` (a bare `http://h`
    * request is `/`, the robots-matching convention). Matching is over
    * the path AS GIVEN — RFC 9309 compares percent-DECODED paths, so
    * callers with encoded URLs must pre-normalize both the URLs and the
    * rule prefixes to one encoding before [[policyFilter]]. */
  def pathOf(url: Column): Column = {
    val rest = restOf(url)
    val p = substring_index(substring_index(
      rest.substr(length(hostportOf(rest)) + 1, length(rest)), "?", 1), "#", 1)
    when(p === "", lit("/")).otherwise(p)
  }

  /** Longest-prefix-match crawl policy — robots.txt Allow/Disallow
    * semantics (RFC 9309 §2.2.2: the most specific — longest — matching
    * rule wins; on a length tie Allow wins; a URL matching no rule is
    * allowed). `rules` is `(host, path_prefix, allow)` — the parsed
    * per-host rule table a robots fetch produces. Returns the input
    * plus `(host, path, matched_prefix, allowed)`; `matched_prefix` is
    * `''` when no rule matched.
    *
    * RFC 9309 §2.2.3 special characters ARE supported: `*` in a rule
    * matches any character sequence (including empty) and a TRAILING
    * `$` anchors the rule to the end of the path (a mid-pattern `$` is
    * literal, the de-facto parser convention). Rules carrying either
    * compile to an anchored regex on the broadcast side (once per rule,
    * never per row); plain-prefix rules keep the cheap `startsWith`
    * path. Specificity stays `length(path_prefix)` of the RAW rule
    * text, wildcards included — the documented big-crawler tiebreak.
    *
    * 100 TB shape: rule tables are KB–MB (they are hand-written files),
    * so the candidate match is a BROADCAST equi-join on host — the data
    * side never shuffles for it; each URL fans out to at most its
    * host's rule count before the winner window, whose partitions are
    * (id, host, path)-keyed and rule-bounded. The winner pick and the
    * fan-back are co-partitioned keyed exchanges, nothing data²
    * anywhere. */
  def policyFilter(
      df: DataFrame, idCol: String, urlCol: String,
      rules: DataFrame): DataFrame = {
    val base = df
      .withColumn("host", hostOf(col(urlCol)))
      .withColumn("path", pathOf(col(urlCol)))
    // rule-pattern → anchored regex, computed ON THE RULES FRAME (KB-
    // sized, broadcast): escape every regex metachar, then re-open the
    // two RFC 9309 specials — escaped '*' becomes '.*', an escaped
    // TRAILING '$' becomes the end anchor. The identical 3-step
    // transform is written in the oracle SQL (DuckDB regexp_replace),
    // so parity holds by construction, not by hand-kept regex literals.
    val esc = regexp_replace(col("path_prefix"),
      "([\\\\.\\[\\]{}()+?^$|*])", "\\\\$1")
    val star = regexp_replace(esc, "\\\\\\*", ".*")
    val anchored = regexp_replace(star, "\\\\\\$$", "\\$")
    val r = rules.select(
      col("host").as("_r_host"), col("path_prefix"),
      col("allow").cast("boolean").as("_r_allow"),
      (col("path_prefix").contains("*") ||
        col("path_prefix").endsWith("$")).as("_r_wild"),
      concat(lit("^"), anchored).as("_r_regex"))
    // the winner is a pure function of (host, path); keying the window
    // and the fan-back join on (id, host, path) keeps rows with a
    // duplicated id but different URLs independent (an id-only key
    // would cross-assign one row's verdict to the other)
    val matched = base
      .select(col(idCol), col("host"), col("path")).distinct()
      .join(broadcast(r),
        col("host") === col("_r_host") &&
          when(col("_r_wild"), expr("path rlike _r_regex"))
            .otherwise(col("path").startsWith(col("path_prefix"))))
      .withColumn("_rn",
        row_number().over(
          Window.partitionBy(col(idCol), col("host"), col("path"))
            .orderBy(length(col("path_prefix")).desc, col("_r_allow").desc,
              col("path_prefix").asc)))
      .filter(col("_rn") === 1)
      .select(col(idCol).as("_m_id"), col("host").as("_m_host"),
        col("path").as("_m_path"),
        col("path_prefix").as("matched_prefix"), col("_r_allow"))
    base.join(matched,
        base(idCol) === col("_m_id") && base("host") === col("_m_host") &&
          base("path") === col("_m_path"), "left")
      .withColumn("matched_prefix", coalesce(col("matched_prefix"), lit("")))
      .withColumn("allowed", coalesce(col("_r_allow"), lit(true)))
      .drop("_m_id", "_m_host", "_m_path", "_r_allow")
  }

  /** Resolve a `<link rel="canonical">` href against the page's fetch
    * URL (which must carry a scheme — fetch logs do): an absolute href
    * stands; `//host/path` (protocol-relative) takes the fetch scheme;
    * `/path` (root-relative) takes the fetch origin (lowercased scheme
    * + RAW hostport — case washes out in [[normalizeUrl]] downstream);
    * an empty href or a path-relative one (`page.html`, out of scope
    * for canonical declarations in practice) falls back to the fetch
    * URL itself. Pure string projection, no shuffle. */
  def resolveCanonical(href: Column, fetchUrl: Column): Column = {
    val scheme = lower(substring_index(fetchUrl, "://", 1))
    val origin = concat(scheme, lit("://"), hostportOf(restOf(fetchUrl)))
    // relative forms are tested BEFORE the '://' absolute sniff: a
    // root-relative href with an embedded URL in its query
    // (`/r?to=https://x`) contains '://' but is still root-relative
    // and must resolve against the fetch origin (r14 advice)
    when(href === "", fetchUrl)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"), concat(origin, href))
      .when(instr(href, "://") > 0, href)
      .otherwise(fetchUrl)
  }

  /** Canonical-URL collapse — RefinedWeb's dedup key: every fetch URL
    * maps to `canon_url` = [[normalizeUrl]] of its resolved canonical
    * declaration ([[resolveCanonical]]; the fetch URL itself when the
    * page declares none), then fetch-URL groups collapse onto that key
    * with the keep-min survivor rule (`keep` = row carries the group's
    * smallest `idCol` — the dedup_exact_survivors convention). Adds
    * `(canon_url, group_n, keep)`.
    *
    * 100 TB shape: one projection + one keyed window on `canon_url` —
    * a single hash exchange on the collapse key, partitions bounded by
    * the largest mirror set (tens, not data-sized); no global order
    * anywhere. */
  def canonicalCollapse(
      df: DataFrame, idCol: String, urlCol: String,
      hrefCol: String): DataFrame = {
    val w = Window.partitionBy("canon_url")
    df.withColumn("canon_url",
        normalizeUrl(resolveCanonical(col(hrefCol), col(urlCol))))
      .withColumn("group_n", count(lit(1)).over(w).cast("long"))
      .withColumn("keep", col(idCol) === min(col(idCol)).over(w))
  }

  /** Fetch-order scheduling over an admitted frontier — the crawl
    * family's operational close (the frontier says WHAT may be
    * fetched; this says WHEN): each URL gets its host's queue position
    * `q` (per-host novelty order — lexicographic on the normalized
    * URL, the frontier's own deterministic convention), a politeness
    * slot `sched_sec = (q−1)·politenessSec` (RFC 9309 crawl-delay
    * spacing: one fetch per host per interval), and an integer
    * priority `priority_fp = rank_fp div q` — host centrality
    * ([[Graph.pageRank]] fixed-point over the host link graph) damped
    * by queue depth, so a deep queue on one big host never starves
    * fresh hosts. Emits the next-fetch batch: the `batchSize` highest
    * priorities (ties broken on url).
    *
    * 100 TB shape: ONE keyed shuffle of the frontier (the rank join on
    * host; AQE broadcasts the |hosts|-sized rank frame in practice) +
    * per-host windows bounded by host queue length; the batch pick is
    * a distributed top-K (per-partition heads + one bounded reduce —
    * `TakeOrderedAndProject`, plan-pinned), NEVER a global sort. The
    * pagerank iterations run on the |hosts| graph, not the corpus. */
  def frontierSchedule(
      frontier: DataFrame, hostGraph: DataFrame,
      politenessSec: Long, batchSize: Int, rankIters: Int = 3): DataFrame = {
    require(politenessSec >= 1, s"politenessSec must be >= 1: $politenessSec")
    require(batchSize >= 1, s"batchSize must be >= 1: $batchSize")
    val ranks = Graph.pageRank(hostGraph, rankIters, "src_host", "dst_host")
    val w = Window.partitionBy("host").orderBy("url_norm")
    frontier.select("host", "url_norm")
      .join(ranks, col("host") === col("node"), "left")
      .drop("node")
      // a frontier host absent from the link graph gets the dangling
      // floor (the teleport share 15·Scale div 100)
      .withColumn("rank_fp",
        coalesce(col("rank_fp"), lit(15L * Graph.Scale / 100L)))
      .withColumn("q", row_number().over(w).cast("long"))
      .withColumn("priority_fp", expr("rank_fp div q"))
      .withColumn("sched_sec", (col("q") - lit(1L)) * lit(politenessSec))
      .orderBy(col("priority_fp").desc, col("url_norm"))
      .limit(batchSize)
      .select("host", "url_norm", "q", "rank_fp", "priority_fp", "sched_sec")
  }

  /** Drop rows whose `domainCol` appears in `blocklist` (one column
    * named `domain`): broadcast left-anti join — blocklists are tiny
    * relative to the corpus, so this never shuffles the data side. */
  def blocklistFilter(df: DataFrame, domainCol: String, blocklist: DataFrame): DataFrame = {
    val bl = blocklist.select(col("domain").as("__blocked_domain"))
    df.join(broadcast(bl), df(domainCol) === bl("__blocked_domain"), "left_anti")
  }
}

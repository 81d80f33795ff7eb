"""robots.txt parsing and crawl-frontier filtering.

No reference counterpart (SURVEY §2.I widening): the ingest side of
a web-scale pipeline must honor per-host exclusion rules before
fetching; at frontier scale (10^10 candidate URLs) that is a
DataFrame join problem, not a per-URL library call.

Parsing follows the original robots exclusion protocol with RFC 9309
group semantics: consecutive ``User-agent:`` lines open a group that
the following Allow/Disallow rules belong to; the group chosen for
an agent is the most specific matching one (exact token beats ``*``);
an empty ``Disallow:`` means allow-all. Patterns support the RFC's
``*`` wildcard and ``$`` end anchor (translated to an anchored regex
once at parse time); rule precedence is longest-pattern-first with
Allow winning ties — the de-facto standard (RFC 9309 §2.2.2).

Scale: `frontier_filter` broadcasts the rules table (hosts × rules —
tiny next to the frontier), equi-joins on host, and picks the most
specific matching rule per URL with one max_by aggregation (no
window over the frontier). URLs on hosts with no rules pass.
"""

from __future__ import annotations

import re

import pandas as pd  # module scope: pandas_udf resolves the string
#                      type hints of nested UDFs via __globals__
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from tika_spark.analysis.webgraph import host_of


def parse_robots_full(text: str, agent: str = "*") -> dict:
    """Full parse for one agent: ``{"rules": [(pattern, allowed)],
    "crawl_delay": float seconds | None, "sitemaps": [url, ...]}``.

    Group selection: longest user-agent token that is a
    case-insensitive substring of ``agent`` (or equals ``*``); the
    generic ``*`` group is the fallback. Per RFC 9309 §2.2.1 rules
    are MERGED across every group that achieves the winning
    specificity — a robots.txt with two separate ``User-agent: *``
    groups contributes both groups' rules. ``Crawl-delay`` (de-facto
    extension) is per-group; when merged groups disagree the minimum
    wins (deterministic, and the conservative choice for the host is
    the maximum fetch rate the site explicitly granted any matching
    group). ``Sitemap`` lines are group-independent per the sitemaps
    protocol and always collected, in file order.
    """
    groups: list[tuple[list[str], list, float | None]] = []
    sitemaps: list[str] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    delay: float | None = None
    in_rules = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules and agents:
                groups.append((agents, rules, delay))
                agents, rules, delay = [], [], None
            agents.append(val.lower())
            in_rules = False
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
        elif key == "crawl-delay":
            if not agents:
                continue
            in_rules = True
            try:
                d = float(val)
                if d >= 0:
                    delay = d
            except ValueError:
                pass
        elif key in ("allow", "disallow"):
            if not agents:
                continue    # rules before any user-agent line: ignored
            in_rules = True
            if key == "disallow" and val == "":
                continue    # empty Disallow = no restriction
            if val:
                rules.append((val, key == "allow"))
    if agents:
        groups.append((agents, rules, delay))

    agent_l = agent.lower()

    def group_score(ags: list[str]) -> int | None:
        score: int | None = None
        for a in ags:
            if a == "*":
                s = 0
            elif a and a in agent_l:
                s = len(a)
            else:
                continue
            if score is None or s > score:
                score = s
        return score

    scored = [(s, rs, d) for ags, rs, d in groups
              if (s := group_score(ags)) is not None]
    if not scored:
        return {"rules": [], "crawl_delay": None,
                "sitemaps": sitemaps}
    win = max(s for s, _, _ in scored)
    merged: list[tuple[str, bool]] = []
    delays: list[float] = []
    for s, rs, d in scored:
        if s == win:
            merged.extend(rs)
            if d is not None:
                delays.append(d)
    return {"rules": merged,
            "crawl_delay": min(delays) if delays else None,
            "sitemaps": sitemaps}


def parse_robots(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """[(path_pattern, allowed), ...] for the best-matching groups
    (see :func:`parse_robots_full` for the group semantics)."""
    return parse_robots_full(text, agent)["rules"]


def pattern_regex(pattern: str) -> str:
    """Anchored regex for a robots path pattern (* wildcard, $ end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored else "")


def robots_rules(pages: DataFrame, host_col: str = "host",
                 text_col: str = "robots_txt",
                 agent: str = "*") -> DataFrame:
    """(host, robots.txt) → exploded (host, pattern, pattern_len,
    regex, allowed) rules for ``agent``. One small pandas-UDF parse
    per host row — the rules table, not the frontier."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "array<struct<pattern:string,allowed:boolean,regex:string>>")
    def parse(texts: pd.Series) -> pd.Series:
        return pd.Series([
            [{"pattern": p, "allowed": a, "regex": pattern_regex(p)}
             for p, a in parse_robots(t or "", agent)]
            for t in texts])

    return (pages
            .select(F.col(host_col).alias("host"),
                    F.explode(parse(F.col(text_col))).alias("r"))
            .select("host", F.col("r.pattern").alias("pattern"),
                    F.length("r.pattern").cast("long")
                    .alias("pattern_len"),
                    F.col("r.allowed").alias("allowed"),
                    F.col("r.regex").alias("regex")))


def robots_meta(pages: DataFrame, host_col: str = "host",
                text_col: str = "robots_txt",
                agent: str = "*",
                default_delay_ms: int = 1000) -> DataFrame:
    """(host, robots.txt) → per-host politeness metadata:
    ``(host, crawl_delay_ms, n_sitemaps, sitemaps)`` — the two
    robots.txt signals the frontier SCHEDULER (as opposed to the
    frontier filter) needs: fetch-rate budgeting per host and the
    sitemap seed list. ``crawl_delay_ms`` falls back to
    ``default_delay_ms`` when the file grants no delay. Same scale
    shape as :func:`robots_rules`: one pandas-UDF parse per host row
    of the (tiny) per-host table."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<delay_ms:bigint,sitemaps:array<string>>")
    def parse(texts: pd.Series) -> pd.DataFrame:
        delays, maps = [], []
        for t in texts:
            full = parse_robots_full(t or "", agent)
            d = full["crawl_delay"]
            delays.append(default_delay_ms if d is None
                          else int(round(d * 1000)))
            maps.append(full["sitemaps"])
        return pd.DataFrame({"delay_ms": delays, "sitemaps": maps})

    return (pages
            .select(F.col(host_col).alias("host"),
                    parse(F.col(text_col)).alias("m"))
            .select("host",
                    F.col("m.delay_ms").alias("crawl_delay_ms"),
                    F.size("m.sitemaps").cast("long")
                    .alias("n_sitemaps"),
                    F.array_join("m.sitemaps", " ")
                    .alias("sitemaps")))


def fetch_schedule(frontier: DataFrame, meta: DataFrame,
                   url_col: str = "url", host_col: str = "host",
                   priority_col: str = "priority",
                   default_delay_ms: int = 1000) -> DataFrame:
    """Politeness-aware fetch schedule: within each host, order by
    (priority desc, url asc) and give slot k the offset
    ``(k-1) * crawl_delay_ms`` — the earliest time the crawler may
    issue that fetch while honoring the host's granted rate
    (:func:`robots_meta`'s ``crawl_delay_ms``; hosts absent from
    ``meta`` get ``default_delay_ms``).

    Emits (url, host, slot, fetch_offset_ms). Scale: the window
    partitions BY HOST (never global), the meta table is a broadcast
    left join — one frontier shuffle on host, which the downstream
    per-host fetch queues need anyway.
    """
    w = Window.partitionBy("host").orderBy(
        F.desc(priority_col), F.asc(url_col))
    m = meta.select(F.col(host_col).alias("host"),
                    F.col("crawl_delay_ms").alias("__delay"))
    return (frontier
            .select(F.col(url_col).alias("url"),
                    F.col(host_col).alias("host"),
                    F.col(priority_col))
            .join(F.broadcast(m), "host", "left")
            .withColumn("slot", F.row_number().over(w).cast("long"))
            .select("url", "host", "slot",
                    ((F.col("slot") - 1)
                     * F.coalesce("__delay",
                                  F.lit(default_delay_ms)))
                    .cast("long").alias("fetch_offset_ms")))


def assign_fetchers(frontier: DataFrame, n_fetchers: int,
                    host_col: str = "host") -> DataFrame:
    """Rendezvous (highest-random-weight) hashing of hosts onto
    fetcher nodes: fetcher = argmax_k md5(host ':' k). The property
    that matters at crawl scale: when a fetcher joins or leaves,
    ONLY the hosts whose argmax involved it move (1/n churn),
    unlike mod-N hashing where nearly everything reshuffles. Hosts
    (not urls) are the unit so per-host politeness state lives on
    exactly one node.

    Emits (host, fetcher). Map-only integer expressions — the
    32-hex md5 prefix compares as an unsigned draw, ties broken by
    fetcher index implicitly (strict > keeps the first max).
    """
    if n_fetchers < 1:
        raise ValueError("assign_fetchers: n_fetchers >= 1")
    hosts = frontier.select(F.col(host_col).alias("host")).distinct()
    draws = [F.conv(F.substring(
        F.md5(F.concat(F.col("host"), F.lit(f":{k}"))), 1, 15),
        16, 10).cast("bigint") for k in range(n_fetchers)]
    best = draws[0]
    pick = F.lit(0)
    for k in range(1, n_fetchers):
        pick = F.when(draws[k] > best, F.lit(k)).otherwise(pick)
        best = F.greatest(best, draws[k])
    return hosts.select("host",
                        pick.cast("int").alias("fetcher"))


def frontier_filter(urls: DataFrame, rules: DataFrame,
                    url_col: str = "url") -> DataFrame:
    """Per-URL fetch decision: broadcast-join rules on host, keep
    matching rules, take the most specific (longest pattern, Allow
    wins ties) via one max_by agg. Adds ``fetch_allowed``."""
    path = F.coalesce(
        F.nullif(F.regexp_extract(
            F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$",
            1), F.lit("")),
        F.lit("/"))
    u = urls.select(F.col(url_col).alias("url"),
                    host_of(F.col(url_col)).alias("host"),
                    path.alias("path"))
    joined = (u.join(F.broadcast(rules), "host", "left")
              .withColumn("m", F.col("pattern").isNotNull()
                          & F.regexp_like(F.col("path"),
                                          F.col("regex"))))
    # specificity key: (pattern_len, allowed) — max_by gives the
    # longest match, Allow beating Disallow on equal length
    verdict = (joined
               .groupBy("url")
               .agg(F.max_by(
                   F.col("allowed"),
                   F.when(F.col("m"),
                          F.col("pattern_len") * 2
                          + F.col("allowed").cast("long")))
                   .alias("best_allowed")))
    return verdict.select(
        "url", F.coalesce("best_allowed", F.lit(True))
        .alias("fetch_allowed"))

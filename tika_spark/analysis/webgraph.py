"""Web-graph curation operators: host graph, PageRank, anchor text.

No reference counterpart (SURVEY.md §2.I widening) — these are the
link-graph half of a web-corpus curation stack: Common-Crawl-style
pipelines rank hosts by centrality to pick crawl budgets and to
feature-ize document quality (the public CC webgraph releases publish
exactly these host-level ranks), and anchor-text aggregation builds
the retrieval-style "what the web calls this page" signal used for
query-document training pairs.

Everything here is built-in DataFrame ops — explode, groupBy, equi-
joins — over the `links` column the extraction chain (C8) already
emits; text never moves, only (src, dst, anchor) rows.

Determinism contract (cross-engine hash-exact): PageRank runs in
integer micro-units (BIGINT) with floor division at every step, so
the distributed sum order cannot perturb a single bit and a SQL
oracle can replay the iterations exactly.

Scale notes (100 TB corpus, ~10^8 hosts):
- `link_edges` is map-only off the extraction output (one explode).
- `host_graph` shuffles 2-host rows once (groupBy pair) — edge rows
  are ~30 bytes; anchor text stays behind on the doc-level edge set.
- `pagerank` per iteration: one equi-join ranks⋈edges on src (ranks
  is the small side at host granularity — broadcastable up to ~10^8
  hosts × 16 B), one groupBy dst. The dangling-mass scalar folds in
  via a one-row crossJoin (no driver collect). Each iteration ends
  in an eager `localCheckpoint()`: the rank plan references itself
  three times per step, so lineage must be TRUNCATED (not just
  cached) or the plan tree grows ~3^k — the standard iterative-
  algorithm discipline on Spark.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SCALE = 1_000_000  # integer micro-units for all rank arithmetic


def resolve_redirects(edges: DataFrame, max_hops: int = 5,
                      src_col: str = "url",
                      dst_col: str = "location") -> DataFrame:
    """Terminal-destination resolution over a crawl's 3xx edges
    (e.g. ``sources.warc.http_headers_census`` rows carrying a
    Location): follow url → location chains up to ``max_hops`` so
    the corpus can canonicalize every captured URL to where it
    actually lands (dedup and link-graph edges should credit the
    terminal page, not the hop).

    Emits (url, final_url, hops, terminal): ``terminal`` False means
    the walk was cut by ``max_hops`` (longer chain or a loop). Pure
    keyed equi-joins, one per hop, no driver loop state — the
    bounded-unrolled-iteration discipline PageRank uses.
    """
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .filter(F.col("dst") != "").dropDuplicates(["src"]))
    cur = e.select(F.col("src").alias("url"),
                   F.col("dst").alias("final_url"),
                   F.lit(1).alias("hops"))
    for _ in range(max_hops - 1):
        nxt = e.select(F.col("src").alias("final_url"),
                       F.col("dst").alias("__d"))
        cur = (cur.join(nxt, "final_url", "left")
               .select("url",
                       F.coalesce("__d", "final_url")
                       .alias("final_url"),
                       (F.col("hops")
                        + F.when(F.col("__d").isNotNull(), 1)
                        .otherwise(0)).alias("hops")))
    more = e.select(F.col("src").alias("final_url"),
                    F.lit(True).alias("__more"))
    return (cur.join(more, "final_url", "left")
            .select("url", "final_url",
                    F.col("hops").cast("long").alias("hops"),
                    F.col("__more").isNull().alias("terminal")))


def host_of(col: F.Column) -> F.Column:
    """Authority component of an absolute URL ('' when relative)."""
    return F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)


def link_edges(extracted: DataFrame, kinds: tuple[str, ...] = ("a",),
               url_col: str = "url") -> DataFrame:
    """Explode the C8 `links` column into (src, dst, anchor) rows.

    ``kinds`` filters the link kind recorded by the HTML chain
    ('a' hrefs by default; 'img' srcs carry alt text as anchor).
    Map-only: stays in the extraction output's stage.
    """
    return (extracted
            .select(F.col(url_col).alias("src"),
                    F.explode("links").alias("lk"))
            .filter(F.col("lk.kind").isin(*kinds))
            .select("src", F.col("lk.uri").alias("dst"),
                    F.col("lk.text").alias("anchor")))


def host_graph(edges: DataFrame, keep_self_loops: bool = True) -> DataFrame:
    """Collapse a URL edge set to the weighted host graph
    (src_host, dst_host, weight). Edges whose endpoint has no
    authority (relative dst never resolved) are dropped."""
    hg = edges.select(host_of(F.col("src")).alias("src_host"),
                      host_of(F.col("dst")).alias("dst_host"))
    hg = hg.filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not keep_self_loops:
        hg = hg.filter(F.col("src_host") != F.col("dst_host"))
    return (hg.groupBy("src_host", "dst_host")
            .agg(F.count(F.lit(1)).alias("weight")))


def degree_stats(hgraph: DataFrame) -> DataFrame:
    """Per-host weighted out/in degree from a host graph — the
    cheapest crawl-frontier quality features. One shuffle per side,
    full outer merge on host."""
    out_d = (hgraph.groupBy(F.col("src_host").alias("host"))
             .agg(F.sum("weight").alias("out_weight")))
    in_d = (hgraph.groupBy(F.col("dst_host").alias("host"))
            .agg(F.sum("weight").alias("in_weight")))
    return (out_d.join(in_d, "host", "full_outer")
            .select("host",
                    F.coalesce("out_weight", F.lit(0)).cast("long")
                    .alias("out_weight"),
                    F.coalesce("in_weight", F.lit(0)).cast("long")
                    .alias("in_weight")))


def pagerank(hgraph: DataFrame, iterations: int = 3,
             damping_micro: int = 850_000) -> DataFrame:
    """Weighted PageRank over a host graph in exact integer micro-units.

    Per iteration, with N = |nodes| and all ``/`` meaning BIGINT floor
    division:

        contrib(e)  = damping * rank(src) * weight(e)
                      / (SCALE * out_weight(src))
        dangling    = Σ rank(n) over nodes with out_weight = 0
        rank'(n)    = (SCALE - damping) / N
                      + damping * dangling / (SCALE * N)
                      + Σ contrib over in-edges of n

    Floor-division rounding loses ≤1 micro-unit per term — the usual
    float formulation differs only below 1e-5 — and buys bit-exact
    reproducibility across engines, partitionings, and retries.

    Returns (host, rank_micro). Total mass ≈ SCALE (minus rounding).
    """
    nodes = (hgraph.select(F.col("src_host").alias("host"))
             .union(hgraph.select("dst_host"))
             .distinct().persist())
    n = nodes.count()  # one O(hosts) job for the scalar N
    if n == 0:
        nodes.unpersist()
        return hgraph.sparkSession.createDataFrame(
            [], "host string, rank_micro long")
    out_w = (hgraph.groupBy(F.col("src_host").alias("host"))
             .agg(F.sum("weight").alias("out_weight")))
    deg = nodes.join(out_w, "host", "left").select(
        "host", F.coalesce("out_weight", F.lit(0)).alias("out_weight")
    ).persist()

    base = (SCALE - damping_micro) // n
    ranks = deg.select("host", F.lit(SCALE // n).cast("long")
                       .alias("rank_micro")).persist()
    for _ in range(iterations):
        r = ranks.join(deg, "host")
        # one-row dangling-mass scalar folded back via crossJoin —
        # never a driver-side collect
        dang = (r.filter(F.col("out_weight") == 0)
                .agg(F.coalesce(F.sum("rank_micro"), F.lit(0))
                     .alias("dangling")))
        contribs = (hgraph
                    .join(r.filter(F.col("out_weight") > 0),
                          hgraph.src_host == r.host)
                    .select(F.col("dst_host").alias("host"),
                            F.expr(f"{damping_micro}L * rank_micro * weight"
                                   f" div ({SCALE}L * out_weight)")
                            .alias("c"))
                    .groupBy("host").agg(F.sum("c").alias("in_mass")))
        nxt = (nodes.join(contribs, "host", "left").crossJoin(dang)
               .select("host",
                       (F.lit(base)
                        + F.expr(f"{damping_micro}L * dangling"
                                 f" div ({SCALE}L * {n})")
                        + F.coalesce("in_mass", F.lit(0)))
                       .cast("long").alias("rank_micro")))
        # eager localCheckpoint: materializes the iteration AND
        # truncates lineage — the rank plan references itself three
        # times per iteration (contribs, dangling, next), so without
        # truncation the plan tree grows ~3^k and the driver dies
        # compiling/printing it long before data is a problem
        nxt = nxt.localCheckpoint(eager=True)
        ranks.unpersist()
        ranks = nxt
    nodes.unpersist()
    deg.unpersist()
    return ranks


def hits(hgraph: DataFrame, iterations: int = 2) -> DataFrame:
    """Weighted HITS (Kleinberg 1999) hubs/authorities over a host
    graph, in exact integer micro-units — the complement of
    :func:`pagerank`: authority rewards being linked FROM good hubs
    (directory/portal hosts), hub rewards linking TO good
    authorities; crawl frontiers seed from hubs, quality features
    read authorities.

    Per iteration, with all ``/`` meaning BIGINT floor division
    (L1 normalization instead of the classical L2 — scale-free in
    exact integers, same fixed-point direction):

        raw_auth(n) = Σ hub(src) * w(e)   over in-edges of n
        auth'(n)    = SCALE * raw_auth(n) / Σ raw_auth
        raw_hub(n)  = Σ auth'(dst) * w(e) over out-edges of n
        hub'(n)     = SCALE * raw_hub(n) / Σ raw_hub

    Returns (host, auth_micro, hub_micro); each column sums to
    ≈ SCALE minus floor-rounding. Same per-iteration discipline as
    pagerank: ranks⋈edges equi-join + groupBy, scalar totals folded
    back via one-row crossJoin, eager localCheckpoint truncating the
    self-referencing lineage.
    """
    nodes = (hgraph.select(F.col("src_host").alias("host"))
             .union(hgraph.select("dst_host"))
             .distinct().persist())
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return hgraph.sparkSession.createDataFrame(
            [], "host string, auth_micro long, hub_micro long")
    hubs = nodes.select(
        "host", F.lit(SCALE // n).cast("long").alias("hub_micro"))
    auths = nodes.select(
        "host", F.lit(0).cast("long").alias("auth_micro"))
    for _ in range(iterations):
        raw_a = (hgraph.join(hubs, hgraph.src_host == hubs.host)
                 .select(F.col("dst_host").alias("host"),
                         (F.col("hub_micro") * F.col("weight"))
                         .cast("long").alias("r"))
                 .groupBy("host").agg(F.sum("r").alias("raw_auth")))
        tot_a = raw_a.agg(F.coalesce(F.sum("raw_auth"), F.lit(0))
                          .alias("t"))
        auths = (nodes.join(raw_a, "host", "left").crossJoin(tot_a)
                 .select("host",
                         F.when(F.col("t") > 0, F.expr(
                             f"{SCALE}L * coalesce(raw_auth, 0L)"
                             " div t"))
                         .otherwise(F.lit(0))
                         .cast("long").alias("auth_micro")))
        auths = auths.localCheckpoint(eager=True)
        raw_h = (hgraph.join(auths, hgraph.dst_host == auths.host)
                 .select(F.col("src_host").alias("host"),
                         (F.col("auth_micro") * F.col("weight"))
                         .cast("long").alias("r"))
                 .groupBy("host").agg(F.sum("r").alias("raw_hub")))
        tot_h = raw_h.agg(F.coalesce(F.sum("raw_hub"), F.lit(0))
                          .alias("t"))
        hubs = (nodes.join(raw_h, "host", "left").crossJoin(tot_h)
                .select("host",
                        F.when(F.col("t") > 0, F.expr(
                            f"{SCALE}L * coalesce(raw_hub, 0L)"
                            " div t"))
                        .otherwise(F.lit(0))
                        .cast("long").alias("hub_micro")))
        hubs = hubs.localCheckpoint(eager=True)
    out = auths.join(hubs, "host")
    nodes.unpersist()
    return out.select("host", "auth_micro", "hub_micro")


def anchor_summary(edges: DataFrame, k: int = 2) -> DataFrame:
    """Per-target anchor-text roll-up: in-link count plus the first
    ``k`` distinct anchors in lexicographic order (deterministic under
    any partitioning — collect_set is unordered, so sort then slice).

    One shuffle on dst; only (dst, anchor) strings move.
    """
    return (edges
            .filter(F.col("anchor").isNotNull() & (F.col("anchor") != ""))
            .groupBy(F.col("dst"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_inlinks"),
                 F.concat_ws(
                     "|", F.slice(F.array_sort(F.collect_set("anchor")),
                                  1, k)).alias("anchors")))

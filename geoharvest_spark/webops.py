"""Web-corpus URL operators: canonicalization + registered-domain rollup.

Every large-scale web-text pipeline normalizes URLs before dedup and
per-domain quality accounting (the reference harvests per-repository/
per-origin the same way its `origin_from_url` buckets source URLs —
`harvester/harvest/ogm.py` origin handling; this module generalizes that
to the open-web case). Canonical form here:

1. drop the fragment (``#...``);
2. lowercase the scheme and the host:port authority (path/query keep case);
3. drop a single leading ``www.`` label;
4. drop the scheme's default port (``:80`` for http, ``:443`` for https);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   preserving the order of the survivors, and the ``?`` itself when none
   survive;
6. normalize an empty path to ``/`` and strip one trailing slash from any
   longer path.

Registered domain is PSL-lite: a built-in list of common two-level public
suffixes (co.uk, com.au, ...) picks three labels, anything else two.

Everything is pure Catalyst expressions (regexp_extract / regexp_replace /
split / filter / array_join) — whole-stage codegen, no UDF, no shuffle for
the per-row stage; the domain rollup is a two-stage hash aggregate. The
DuckDB oracle re-implements the same spec independently over RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# two-level public suffixes recognized by the PSL-lite registered-domain
# rule — the pattern is shared verbatim with the SQL oracle
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "co.jp", "co.nz", "com.br", "co.in",
)

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def _suffix_pattern() -> str:
    alts = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
    return r"([^.]+\.(?:" + alts + r"))$"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL per the module spec. Pure codegen expressions."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.when(
        (scheme == "http"), F.regexp_replace(hostport, r":80$", "")
    ).when(
        (scheme == "https"), F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), hostport, path, qtail)


def host_of(url: Column) -> Column:
    """Lowercased host (no port, no www) of a URL."""
    h = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))
    return F.regexp_replace(h, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """PSL-lite registered domain: three labels over a known two-level
    public suffix, else two labels, else the host itself."""
    two = F.regexp_extract(host, _suffix_pattern(), 1)
    generic = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two != "", two).when(generic != "", generic).otherwise(host)


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds canonical_url, host, domain columns — the pre-dedup URL
    normalization stage of a web pipeline.

    Staged, not inline: `canonicalize_url` as a single Column expression
    re-evaluates each chained regexp once per downstream reference (27
    regexp_replace + 13 regexp_extract per row in the plan); staging each
    intermediate (_nf, _scheme, _hostport, _rest, ...) through its own
    multi-referenced projection alias evaluates each regexp once (the
    same CollapseProject behavior the token-staging fix relies on,
    BASELINE.md round-4). Same spec, same output, plan-tested."""
    d = df.withColumn("_nf", F.regexp_replace(F.col(url_col), r"#.*$", ""))
    d = d.withColumn(
        "_scheme",
        F.lower(F.regexp_extract("_nf", r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)),
    )
    d = d.withColumn(
        "_hp0",
        F.regexp_replace(
            F.lower(
                F.regexp_extract(
                    "_nf", r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
                )
            ),
            r"^www\.",
            "",
        ),
    )
    d = d.withColumn(
        "_hostport",
        F.when(
            F.col("_scheme") == "http",
            F.regexp_replace("_hp0", r":80$", ""),
        )
        .when(
            F.col("_scheme") == "https",
            F.regexp_replace("_hp0", r":443$", ""),
        )
        .otherwise(F.col("_hp0")),
    )
    d = d.withColumn(
        "_rest",
        F.regexp_replace("_nf", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", ""),
    )
    d = d.withColumn("_path0", F.regexp_extract("_rest", r"^([^?]*)", 1))
    d = d.withColumn(
        "_path",
        F.when(F.col("_path0") == "", F.lit("/")).otherwise(
            F.regexp_replace("_path0", r"(.)/$", "$1")
        ),
    )
    d = d.withColumn(
        "_kept",
        F.filter(
            F.split(
                F.when(
                    F.col("_rest").contains("?"),
                    F.regexp_replace("_rest", r"^[^?]*\?", ""),
                ).otherwise(F.lit("")),
                "&",
            ),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        ),
    )
    d = d.withColumn(
        "canonical_url",
        F.concat(
            F.col("_scheme"),
            F.lit("://"),
            F.col("_hostport"),
            F.col("_path"),
            F.when(
                F.size("_kept") > 0,
                F.concat(F.lit("?"), F.array_join("_kept", "&")),
            ).otherwise(F.lit("")),
        ),
    )
    d = d.withColumn(
        "host", F.regexp_replace("_hostport", r":[0-9]+$", "")
    ).withColumn("domain", registered_domain(F.col("host")))
    return d.drop("_nf", "_scheme", "_hp0", "_hostport", "_rest", "_path0", "_path", "_kept")


# entity decode order matters: &amp; LAST so "&amp;lt;" -> "&lt;" (literal),
# never double-decoded to "<" — the oracle applies the same order
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text_from_html(html: Column) -> Column:
    """Boilerplate-stripping text extraction from an HTML string — the
    entry stage of a web-text pipeline. Spec (shared verbatim with the
    SQL oracle): drop <script>/<style> blocks and comments, flatten every
    remaining tag to a space, decode the six common entities (amp last),
    collapse whitespace, trim. Pure regexp/replace Catalyst expressions —
    whole-stage codegen, no UDF; at 100 TB this runs in the scan stage.

    Deliberately a regex extractor, not an HTML5 tree parser: the
    trade-off (bounded cost, no recursion, hostile-input-proof) is the
    same one the engine's tolerant XML path makes (normalize/base.py)."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def domain_rollup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain accounting: total URLs, distinct canonical
    URLs (post-normalization dedup cardinality). Two-stage hash aggregate;
    the distinct count shuffles (domain, canonical_url) once."""
    d = with_canonical_url(df, url_col)
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canonical_url").alias("n_canonical"),
    )


def parse_robots(df: DataFrame, domain_col: str = "domain",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into per-domain rules for user-agent ``*``.

    Spec: lines split on \\n, \\r and comments
    (``#...``) stripped, blank lines ignored; ``User-agent:`` lines open
    a section (CONSECUTIVE user-agent lines share one section, per the
    standard); ``Allow:`` / ``Disallow:`` rules bind to the nearest
    preceding section and are kept only when that section names ``*``;
    an empty-path ``Disallow:`` (allow-all) contributes no rule.

    Plan shape: posexplode lines, one window per domain ordered by line
    index to assign section ids (robots files are KB-sized, so the
    per-domain sort is bounded), then a section-level semi-join keeps
    ``*`` sections. Returns (domain, rule, path) with rule in
    {allow, disallow}."""
    lines = df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("idx", "raw"),
    ).select(
        "domain",
        "idx",
        F.trim(F.regexp_replace(F.regexp_replace("raw", "#.*$", ""), "\r", "")).alias(
            "line"
        ),
    ).where(F.col("line") != "")
    lines = lines.select(
        "domain",
        "idx",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias("key"),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias("val"),
    ).where(F.col("key").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("domain").orderBy("idx")
    is_ua = (F.col("key") == "user-agent").cast("int")
    # a section starts at a user-agent line NOT preceded by another one
    starts = (
        (is_ua == 1)
        & (F.coalesce(F.lag("key").over(w), F.lit("")) != F.lit("user-agent"))
    ).cast("int")
    lines = lines.withColumn("section", F.sum(starts).over(w))
    star_sections = (
        lines.where((F.col("key") == "user-agent") & (F.col("val") == "*"))
        .select("domain", "section")
        .distinct()
    )
    return (
        lines.where(F.col("key").isin("allow", "disallow") & (F.col("val") != ""))
        .join(star_sections, ["domain", "section"], "left_semi")
        .select(
            "domain", F.col("key").alias("rule"), F.col("val").alias("path")
        )
    )


def _robots_rule_pattern(path: Column) -> Column:
    """Compile an RFC 9309 rule path into an anchored regex string:
    ``*`` matches any character run, a TRAILING ``$`` anchors the end of
    the URL path (a ``$`` anywhere else is a literal, per the RFC), and
    everything else is escaped to a literal. The result always carries a
    leading ``^`` — RFC rules are start-anchored prefix patterns."""
    anchored = path.endswith("$")
    body = F.when(
        anchored, F.substring(path, 1, F.length(path) - 1)
    ).otherwise(path)
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    star = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), star, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def with_crawl_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "canonical_url"
) -> DataFrame:
    """Longest-match robots evaluation per URL (allow wins ties — Google
    semantics): join URLs to their domain's rules, keep matching rules,
    pick the longest one (rule length measured on the RAW rule text,
    wildcards included, per RFC 9309 precedence); no matching rule =>
    allowed.

    Rule paths support RFC 9309 wildcards: ``*`` (any character run) and
    a trailing ``$`` (end anchor). Plain prefix rules keep the codegen
    ``startswith`` fast path; only rules that actually contain a
    wildcard take the regex path (Spark's RLike caches the compiled
    pattern while consecutive rows repeat it, which the rules-side join
    order makes the common case).

    The rules side is per-domain KB-scale, so AQE broadcasts it; the
    argmax is a per-URL aggregate (max of (len, is_allow) struct), not a
    window over a sort."""
    path = F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    u = urls.withColumn("_path", path)
    has_wild = F.col("path").rlike(r"[*]|\$$")
    wild_hit = F.expr("rlike(_path, _pattern)")
    m = (
        u.join(
            rules.withColumn(
                "_pattern", _robots_rule_pattern(F.col("path"))
            ),
            "domain",
            "left",
        )
        .withColumn(
            "_hit",
            F.col("path").isNotNull()
            & F.when(has_wild, wild_hit).otherwise(
                F.col("_path").startswith(F.col("path"))
            ),
        )
        .drop("_pattern")
    )
    best = (
        m.where(F.col("_hit"))
        .groupBy("domain", url_col)
        .agg(
            F.max(
                F.struct(
                    F.length("path").alias("l"),
                    (F.col("rule") == "allow").cast("int").alias("a"),
                )
            ).alias("b")
        )
        .select(
            "domain",
            url_col,
            (F.col("b.a") == 1).alias("_allowed_by_rule"),
        )
    )
    return (
        u.join(best, ["domain", url_col], "left")
        .withColumn(
            "crawl_allowed", F.coalesce("_allowed_by_rule", F.lit(True))
        )
        .drop("_path", "_allowed_by_rule")
    )


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """Crawl-frontier expansion: parse sitemap XML payloads into one row
    per referenced URL — both flavors of the sitemaps.org 0.9 protocol:

    - ``<urlset>``: rows (kind='url', loc, lastmod, priority) per
      ``<url>`` entry (lastmod/priority NULL when the child is absent);
    - ``<sitemapindex>``: rows (kind='sitemap', loc, lastmod, NULL) per
      ``<sitemap>`` entry — the loc feeds the next fetch round;
    - undecodable XML diverts to ONE row (kind='invalid', NULLs), the
      F7 divert-not-crash contract.

    XML parse is per-payload Python (namespace-tolerant, same parser the
    MARC/ISO normalizers use) inside an Arrow batch — the operator's
    shuffle sees only the emitted rows, so a sitemap never costs more
    than its URL count regardless of payload size. Entity-escaped locs
    (&amp; in query strings) come back decoded by the XML parser."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, kind string, loc string, "
        "lastmod string, priority double"
    )

    def _map(batches):
        from .normalize.base import tolerant_fromstring

        def _local(tag: str) -> str:
            return tag.rsplit("}", 1)[-1]

        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[id_col], pdf[xml_col]):
                sid = int(sid)
                try:
                    root = tolerant_fromstring(
                        bytes(blob) if not isinstance(blob, bytes) else blob
                    )
                    rname = _local(root.tag)
                    if rname not in ("urlset", "sitemapindex"):
                        raise ValueError(f"not a sitemap root: {rname}")
                    kind = "url" if rname == "urlset" else "sitemap"
                    for entry in root:
                        if _local(entry.tag) not in ("url", "sitemap"):
                            continue
                        loc = lastmod = None
                        prio = None
                        for child in entry:
                            cn = _local(child.tag)
                            txt = (child.text or "").strip()
                            if cn == "loc":
                                loc = txt
                            elif cn == "lastmod":
                                lastmod = txt
                            elif cn == "priority":
                                try:
                                    prio = float(txt)
                                except ValueError:
                                    prio = None
                        if loc:
                            rows.append((sid, kind, loc, lastmod, prio))
                except Exception:
                    rows.append((sid, "invalid", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "kind", "loc", "lastmod", "priority"],
            )

    return df.mapInPandas(_map, out_schema)


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    out_col: str = "link",
) -> DataFrame:
    """Hyperlink extraction + reference resolution — the edge producer
    for a crawl link graph (frontier expansion, PageRank, spam-domain
    analysis all start here).

    Spec (shared verbatim with the SQL oracle):

    1. collect every ``href="..."`` then every ``href='...'`` attribute
       value (case-insensitive; double-quoted values first, then
       single-quoted — order across quote styles is not preserved);
    2. drop empty values, pure fragments (``#...``), and ``mailto:`` /
       ``javascript:`` pseudo-schemes;
    3. resolve against the page's base URL: absolute ``http(s)://``
       values pass through; ``//host/...`` takes the base's scheme;
       ``/path`` joins the base origin; anything else joins the base
       directory (base up to its last ``/``);
    4. strip any fragment from the resolved URL.

    One row per surviving link (``out_col``), original page columns
    retained. Pure Catalyst: regexp_extract_all -> array filter ->
    explode -> a when-chain of string ops, all whole-stage codegen
    before/after the generator — no UDF, no shuffle; at 100 TB this
    rides the scan stage. Relative-reference handling is the RFC 3986
    merge rule for the no-dot-segment case (deliberately not a full
    remove_dot_segments normalizer — same bounded-cost trade-off as
    extract_text_from_html vs an HTML5 tree parser).
    """
    hrefs = F.filter(
        F.concat(
            F.regexp_extract_all(
                F.col(html_col), F.lit(r'(?i)href="([^"]*)"'), F.lit(1)
            ),
            F.regexp_extract_all(
                F.col(html_col), F.lit(r"(?i)href='([^']*)'"), F.lit(1)
            ),
        ),
        lambda h: (h != "")
        & ~h.startswith("#")
        & ~h.rlike(r"^(?i)(mailto|javascript):"),
    )
    d = df.select("*", F.explode(hrefs).alias("_href"))
    h = F.col("_href")
    base = F.col(base_col)
    resolved = (
        F.when(h.rlike(r"^(?i)https?://"), h)
        .when(
            h.startswith("//"),
            F.concat(F.regexp_extract(base, r"^(https?)://", 1), F.lit(":"), h),
        )
        .when(
            h.startswith("/"),
            F.concat(F.regexp_extract(base, r"^(https?://[^/]+)", 1), h),
        )
        .otherwise(F.concat(F.regexp_replace(base, r"[^/]*$", ""), h))
    )
    return d.withColumn(
        out_col, F.regexp_replace(resolved, r"#.*$", "")
    ).drop("_href")


_ANCHOR_DQ = r'(?is)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'
_ANCHOR_SQ = r"(?is)<a\s[^>]*href='([^']*)'[^>]*>(.*?)</a>"


def extract_anchors(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
    link_col: str = "link",
    text_col: str = "anchor",
) -> DataFrame:
    """(resolved link, cleaned anchor text) pairs — the raw material of
    an anchor-text corpus (link-context retrieval training data, title
    enrichment, spam analysis).

    Spec (shared verbatim with the SQL oracle): match ``<a ...
    href="...">INNER</a>`` non-greedily per quote style (double-quoted
    matches first, then single-quoted; DOTALL so anchors span lines);
    hrefs follow the extract_links junk/resolution rules; INNER is
    cleaned by flattening tags to spaces, decoding the six common
    entities (amp last), collapsing whitespace and trimming. Empty
    cleaned anchors (image links etc.) are KEPT as '' — dropping is the
    caller's choice.

    Plan shape: two 2-group regexp extractions staged through their own
    projection (each pattern scans the html once — the INLINE-SPLIT
    trap otherwise re-scans per array reference), arrays_zip + one
    explode, then the same codegen when-chain as extract_links. No
    UDF, no shuffle — rides the scan stage at any scale."""
    d = df
    for tag, pat in (("dq", _ANCHOR_DQ), ("sq", _ANCHOR_SQ)):
        d = d.withColumn(
            f"_h_{tag}",
            F.regexp_extract_all(F.col(html_col), F.lit(pat), F.lit(1)),
        ).withColumn(
            f"_t_{tag}",
            F.regexp_extract_all(F.col(html_col), F.lit(pat), F.lit(2)),
        )
    pairs = F.filter(
        F.concat(
            F.arrays_zip(F.col("_h_dq").alias("h"), F.col("_t_dq").alias("t")),
            F.arrays_zip(F.col("_h_sq").alias("h"), F.col("_t_sq").alias("t")),
        ),
        lambda p: (p["h"] != "")
        & ~p["h"].startswith("#")
        & ~p["h"].rlike(r"^(?i)(mailto|javascript):"),
    )
    d = d.select("*", F.explode(pairs).alias("_pair")).drop(
        "_h_dq", "_t_dq", "_h_sq", "_t_sq"
    )
    h = F.col("_pair.h")
    base = F.col(base_col)
    resolved = (
        F.when(h.rlike(r"^(?i)https?://"), h)
        .when(
            h.startswith("//"),
            F.concat(F.regexp_extract(base, r"^(https?)://", 1), F.lit(":"), h),
        )
        .when(
            h.startswith("/"),
            F.concat(F.regexp_extract(base, r"^(https?://[^/]+)", 1), h),
        )
        .otherwise(F.concat(F.regexp_replace(base, r"[^/]*$", ""), h))
    )
    txt = F.regexp_replace(F.col("_pair.t"), r"<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    txt = F.trim(F.regexp_replace(txt, r"\s+", " "))
    return (
        d.withColumn(link_col, F.regexp_replace(resolved, r"#.*$", ""))
        .withColumn(text_col, txt)
        .drop("_pair")
    )


def anchor_stats(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "url",
) -> DataFrame:
    """Per-target anchor-text aggregation over a page corpus: for every
    resolved link target — total inbound anchors, distinct cleaned
    texts, and the top text (most frequent; ties break on the
    lexicographically smallest text).

    Two hash aggregates, no window, no self-join: groupBy(link, anchor)
    counts, then ONE groupBy(link) carrying the totals AND a
    min-of-struct((-count, anchor)) argmin (min skips the NULLs the
    empty-anchor `when` produces) — splitting totals and argmin into
    two frames would duplicate the whole extraction upstream into both
    join branches (plan-pinned). Both stages partial-aggregate
    map-side, so a hot target (every page linking the homepage) costs
    one combiner row per task, not a buffered partition. Empty cleaned
    anchors are excluded from the top-text vote but counted in
    n_anchors/n_texts."""
    pairs = extract_anchors(df, html_col=html_col, base_col=base_col)
    per = pairs.groupBy("link", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per.groupBy("link")
        .agg(
            F.sum("cnt").cast("long").alias("n_anchors"),
            F.count(F.lit(1)).cast("long").alias("n_texts"),
            F.min(
                F.when(
                    F.col("anchor") != "",
                    F.struct((-F.col("cnt")).alias("nc"), F.col("anchor")),
                )
            ).alias("_b"),
        )
        .select(
            "link",
            "n_anchors",
            "n_texts",
            F.col("_b.anchor").alias("top_anchor"),
            (-F.col("_b.nc")).cast("long").alias("top_cnt"),
        )
    )


def resolve_redirect_chains(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 16,
) -> DataFrame:
    """Resolve every url to its terminal redirect target by POINTER
    DOUBLING: round k maps each pointer to where its target points, so
    a chain of length L resolves in ceil(log2(L)) rounds instead of L
    — the path-halving trick from parallel union-find, and the reason
    a 10^12-row redirect table with month-long chains is still a
    handful of self-joins. Each round is ONE equi-join of the pointer
    table with itself (keyed on the pointed-to url), localCheckpointed
    once per round (loop-family discipline: flat lineage, no re-run of
    the input scan), with a 1-row convergence sync.

    Input: one row per redirect hop (``src`` redirects to ``dst``);
    each src must have at most one outgoing redirect (HTTP semantics —
    duplicate srcs raise). Returns (src, target, hops) for every
    redirecting url: ``target`` is the terminal (non-redirecting) url,
    ``hops`` the exact chain length walked.

    Chains must be acyclic: on a cycle the doubled pointer never
    stabilizes (2^k mod cycle-length oscillates), detected by the
    convergence probe — RuntimeError after ``max_rounds`` (covers
    chains up to 2^max_rounds long), never a silent wrong answer.
    """
    p = redirects.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("tgt"),
        F.lit(1).cast("long").alias("hops"),
    ).localCheckpoint(eager=True)
    n_src = p.count()
    if p.select("src").distinct().count() != n_src:
        raise ValueError("redirects must have at most one dst per src")
    for _ in range(max_rounds):
        q = p.select(
            F.col("src").alias("_s"),
            F.col("tgt").alias("_t"),
            F.col("hops").alias("_h"),
        )
        nxt = (
            p.join(q, p["tgt"] == q["_s"], "left")
            .select(
                "src",
                F.coalesce("_t", "tgt").alias("tgt"),
                (F.col("hops") + F.coalesce("_h", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.join(
                p.select(F.col("src").alias("src"), F.col("tgt").alias("_old")),
                "src",
            )
            .where(F.col("tgt") != F.col("_old"))
            .isEmpty()
        )
        p = nxt
        if changed:
            # terminality check: a resolved target must have NO outgoing
            # redirect. Even-length cycles stabilize the pointer at a
            # self-target (2^k mod c hits 0) — without this they would
            # return silently wrong instead of raising like odd cycles.
            bad = p.join(
                p.select(F.col("src").alias("tgt")).distinct(), "tgt",
                "left_semi",
            )
            if not bad.isEmpty():
                raise RuntimeError(
                    "redirect chains contain a cycle (resolved target "
                    "still redirects)"
                )
            return p.select("src", F.col("tgt").alias("target"), "hops")
    raise RuntimeError(
        f"redirect chains did not resolve in {max_rounds} doubling rounds "
        f"(cycle, or chains longer than 2^{max_rounds})"
    )


def html_tag_histogram(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document HTML tag histogram: counts of each opening tag name
    (lowercased; self-closing and attribute forms included, closing
    tags and comments excluded) — the structure-profile used to spot
    boilerplate templates and non-content pages before text extraction.

    Narrow until the explode: one regexp_extract_all per row (codegen
    RE2, no Python), explode, then a (doc, tag) count. Returns
    (id, tag, n) rows.
    """
    tags = F.expr(
        f"regexp_extract_all(lower({html_col}), "
        "'<([a-z][a-z0-9]*)[^>]*>', 1)"
    )
    staged = df.select(F.col(id_col), tags.alias("_tags"))
    return (
        staged.select(F.col(id_col), F.explode("_tags").alias("tag"))
        .groupBy(id_col, "tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def frontier_schedule(
    urls: DataFrame,
    host_col: str = "host",
    priority_col: str = "priority",
    id_col: str = "url_id",
    delay_col: str = "crawl_delay",
    start_epoch: int = 0,
) -> DataFrame:
    """Politeness-constrained crawl-frontier schedule: within each host,
    urls ordered by (priority, id) fetch one per ``crawl_delay`` seconds
    (the robots.txt Crawl-delay contract) — slot k of a host fires at
    start + k * delay. One host-keyed window (rank) + pure arithmetic;
    the fleet-wide schedule falls out without any coordinator because
    hosts are independent — exactly how a 10^12-url frontier shards.

    Returns (url_id, host, queue_pos, scheduled_at).
    """
    w = Window.partitionBy(host_col).orderBy(priority_col, id_col)
    pos = F.row_number().over(w) - 1
    return urls.select(
        F.col(id_col),
        F.col(host_col),
        pos.alias("queue_pos"),
        (
            F.lit(start_epoch)
            + pos * F.col(delay_col).cast("long")
        ).alias("scheduled_at"),
    )

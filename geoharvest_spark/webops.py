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

from pyspark.sql import Column, DataFrame
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

"""URL canonicalization + registered-domain tests (webops module).

Case table covers each rule of the canonical spec; a plan test pins the
whole stage to JVM codegen (no Python in the hot path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark import webops as wb

CASES = [
    # (raw, canonical, domain)
    (
        "HTTPS://WWW.Example.CO.UK:443/Path/1/?utm_source=a&page=2&fbclid=x#frag",
        "https://example.co.uk/Path/1?page=2",
        "example.co.uk",
    ),
    ("http://Site.com:80/", "http://site.com/", "site.com"),
    ("http://site.com:8080/a", "http://site.com:8080/a", "site.com"),
    ("https://a.b.site.com/x?ref=nav", "https://a.b.site.com/x", "site.com"),
    ("https://news.example.com.au/t/", "https://news.example.com.au/t", "example.com.au"),
    ("ftp://Host.Org:21/file", "ftp://host.org:21/file", "host.org"),
    ("http://localhost/x", "http://localhost/x", "localhost"),
    ("https://site.com", "https://site.com/", "site.com"),
    (
        "https://site.com/p?id=1&utm_medium=m&q=2",
        "https://site.com/p?id=1&q=2",
        "site.com",
    ),
    ("https://site.com/p?utm_only=1", "https://site.com/p", "site.com"),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], ["i", "url"]
    )
    out = wb.with_canonical_url(df).orderBy("i").collect()
    return out


def test_canonical_cases(canon_rows):
    for row, (raw, want_canon, _) in zip(canon_rows, CASES):
        assert row["canonical_url"] == want_canon, raw


def test_registered_domain_cases(canon_rows):
    for row, (raw, _, want_dom) in zip(canon_rows, CASES):
        assert row["domain"] == want_dom, raw


def test_canonical_idempotent(spark, canon_rows):
    # canonicalizing a canonical URL is a fixpoint
    df = spark.createDataFrame(
        [(r["canonical_url"],) for r in canon_rows], ["url"]
    )
    out = wb.with_canonical_url(df).collect()
    for r in out:
        assert r["canonical_url"] == r["url"]


def test_domain_rollup_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "https://WWW.site.com/a#x"),
            (2, "https://site.com/a"),
            (3, "https://site.com/b"),
            (4, "http://other.co.uk/"),
        ],
        ["i", "url"],
    )
    out = {r["domain"]: r for r in wb.domain_rollup(df).collect()}
    assert out["site.com"]["n_urls"] == 3
    assert out["site.com"]["n_canonical"] == 2  # 1 and 2 collapse
    assert out["other.co.uk"]["n_urls"] == 1


def test_canonicalization_stays_jvm_side(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://WWW.Site.com/p/"), F.col("id")).alias("url")
    )
    plan = (
        wb.with_canonical_url(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "*(" in plan  # whole-stage codegen


HTML_CASES = [
    # (html, expected extracted text)
    ("<p>Hello <b>world</b></p>", "Hello world"),
    ("<SCRIPT>var a='<p>hi</p>';</SCRIPT>after", "after"),  # case-insensitive
    ("<style>p{}</style>text<!-- note\nmultiline -->tail", "text tail"),
    ("a &amp;lt; b", "a &lt; b"),  # amp decoded LAST: no double-decode
    ("x &lt;tag&gt; y &quot;q&quot; &#39;s&#39; z", 'x <tag> y "q" \'s\' z'),
    ("<div\nclass='x'>multi\nline</div>", "multi line"),
    ("no markup at all", "no markup at all"),
    # unclosed script: block-regex needs the closing tag, so only the
    # opening tag is flattened and the content (honestly) survives
    ("<script>unclosed script eats rest", "unclosed script eats rest"),
    ("  spaced\t\tout  ", "spaced out"),
]


def test_extract_text_from_html_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(HTML_CASES)], ["i", "html"]
    )
    out = (
        df.select("i", wb.extract_text_from_html(F.col("html")).alias("t"))
        .orderBy("i")
        .collect()
    )
    for row, (h, want) in zip(out, HTML_CASES):
        assert row["t"] == want, h


def test_extract_html_stays_jvm_side(spark):
    df = spark.range(5).select(
        F.concat(F.lit("<p>x"), F.col("id")).alias("html")
    )
    plan = (
        df.select(wb.extract_text_from_html(F.col("html")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_canonicalization_regexps_staged_once(spark):
    # staged intermediates: each spec regexp appears once in the plan
    # (the inline single-Column form re-evaluates chained regexps per
    # downstream reference — 48 vs 15; BASELINE.md round-4)
    df = spark.range(10).select(
        F.concat(F.lit("https://WWW.Site.com/p/"), F.col("id")).alias("url")
    )
    plan = (
        wb.with_canonical_url(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("regexp_replace(") + plan.count("regexp_extract(") <= 15


ROBOTS_FIXTURE = """
# global rules
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:

User-agent: badbot
Disallow: /

User-agent: otherbot
User-agent: *
Disallow: /tmp
""".strip()


def test_parse_robots_sections(spark):
    df = spark.createDataFrame([("site.com", ROBOTS_FIXTURE)], ["domain", "robots_txt"])
    rules = sorted(
        (r["rule"], r["path"]) for r in wb.parse_robots(df).collect()
    )
    # badbot-only section excluded; empty Disallow dropped; the shared
    # (otherbot, *) section's rule kept
    assert rules == [
        ("allow", "/private/ok"),
        ("disallow", "/private"),
        ("disallow", "/tmp"),
    ]


def test_crawl_allowed_longest_prefix(spark):
    rules = spark.createDataFrame(
        [
            ("site.com", "disallow", "/private"),
            ("site.com", "allow", "/private/ok"),
            ("site.com", "disallow", "/tmp"),
        ],
        ["domain", "rule", "path"],
    )
    urls = spark.createDataFrame(
        [
            ("site.com", "https://site.com/public/a"),      # no rule -> allowed
            ("site.com", "https://site.com/private/x"),     # disallow
            ("site.com", "https://site.com/private/ok/y"),  # longer allow wins
            ("site.com", "https://site.com/tmp"),           # disallow
            ("other.org", "https://other.org/anything"),    # no rules at all
        ],
        ["domain", "canonical_url"],
    )
    out = {
        r["canonical_url"]: r["crawl_allowed"]
        for r in wb.with_crawl_allowed(urls, rules).collect()
    }
    assert out["https://site.com/public/a"] is True
    assert out["https://site.com/private/x"] is False
    assert out["https://site.com/private/ok/y"] is True
    assert out["https://site.com/tmp"] is False
    assert out["https://other.org/anything"] is True


def test_crawl_allow_wins_tie(spark):
    rules = spark.createDataFrame(
        [("s.com", "disallow", "/p"), ("s.com", "allow", "/p")],
        ["domain", "rule", "path"],
    )
    urls = spark.createDataFrame(
        [("s.com", "https://s.com/p/x")], ["domain", "canonical_url"]
    )
    out = wb.with_crawl_allowed(urls, rules).collect()[0]
    assert out["crawl_allowed"] is True


def test_crawl_wildcard_star_and_anchor(spark):
    """RFC 9309 wildcards: `*` matches any run, trailing `$` anchors the
    end of the URL path; `$` elsewhere is a literal; regex metachars in
    rule paths are literals."""
    rules = spark.createDataFrame(
        [
            ("s.com", "disallow", "/*.php$"),       # any .php page, anchored
            ("s.com", "allow", "/shop/*.php$"),     # longer -> wins under /shop
            ("s.com", "disallow", "/a*e"),          # star in the middle
            ("s.com", "disallow", "/lit.x"),        # '.' must be literal
            ("s.com", "disallow", "/price$list"),   # non-trailing '$' literal
        ],
        ["domain", "rule", "path"],
    )
    urls = spark.createDataFrame(
        [
            ("s.com", "https://s.com/index.php"),        # *.php$ -> blocked
            ("s.com", "https://s.com/index.php?x=1"),    # not anchored-match -> allowed
            ("s.com", "https://s.com/shop/buy.php"),     # allow wins (longer)
            ("s.com", "https://s.com/apple"),            # /a*e -> blocked
            ("s.com", "https://s.com/ae"),               # empty star run -> blocked
            ("s.com", "https://s.com/litax"),            # '.' literal, no match -> allowed
            ("s.com", "https://s.com/lit.x"),            # exact literal -> blocked
            ("s.com", "https://s.com/price$list/x"),     # literal '$' -> blocked
        ],
        ["domain", "canonical_url"],
    )
    out = {
        r["canonical_url"].rsplit("com", 1)[1]: r["crawl_allowed"]
        for r in wb.with_crawl_allowed(urls, rules).collect()
    }
    assert out["/index.php"] is False
    assert out["/index.php?x=1"] is True
    assert out["/shop/buy.php"] is True
    assert out["/apple"] is False
    assert out["/ae"] is False
    assert out["/litax"] is True
    assert out["/lit.x"] is False
    assert out["/price$list/x"] is False


def test_crawl_wildcard_precedence_raw_length_tie(spark):
    """Precedence counts the RAW rule text length (wildcards included);
    equal length -> allow wins (Google semantics)."""
    rules = spark.createDataFrame(
        [
            ("s.com", "disallow", "/Path/4*"),  # len 8
            ("s.com", "allow", "/Path/4$"),     # len 8 -> tie on /Path/4
        ],
        ["domain", "rule", "path"],
    )
    urls = spark.createDataFrame(
        [
            ("s.com", "https://s.com/Path/4"),    # both match, tie -> allow
            ("s.com", "https://s.com/Path/44"),   # only disallow matches
        ],
        ["domain", "canonical_url"],
    )
    out = {
        r["canonical_url"][-8:]: r["crawl_allowed"]
        for r in wb.with_crawl_allowed(urls, rules).collect()
    }
    assert out["m/Path/4"] is True
    assert out["/Path/44"] is False


def test_parse_sitemaps_flavors_and_diverts(spark):
    """Both sitemaps.org flavors, entity-escaped locs, absent optional
    children, namespace-free XML, empty urlset, and the divert rows for
    non-sitemap/undecodable payloads."""
    from geoharvest_spark.webops import parse_sitemaps

    cases = [
        (0, b'<?xml version="1.0"?><urlset '
            b'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<url><loc>https://a.test/p?x=1&amp;y=2</loc>"
            b"<lastmod>2024-03-01</lastmod><priority>0.8</priority></url>"
            b"<url><loc>https://a.test/q</loc></url></urlset>"),
        (1, b"<sitemapindex><sitemap><loc>https://a.test/sm1.xml</loc>"
            b"</sitemap></sitemapindex>"),  # namespace-free
        (2, b"<urlset></urlset>"),          # empty: zero rows
        (3, b"<html><body>nope</body></html>"),  # wrong root -> invalid
        (4, b"\x00\xff definitely not xml"),     # undecodable -> invalid
        (5, b"<urlset><url><priority>0.5</priority></url>"
            b"<url><loc>https://b.test/ok</loc>"
            b"<priority>bogus</priority></url></urlset>"),
    ]
    df = spark.createDataFrame(cases, "sitemap_id long, sitemap_xml binary")
    out = parse_sitemaps(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["sitemap_id"], []).append(r)
    a = sorted(by[0], key=lambda r: r["loc"])
    assert [r["loc"] for r in a] == [
        "https://a.test/p?x=1&y=2", "https://a.test/q"
    ]
    assert a[0]["lastmod"] == "2024-03-01" and a[0]["priority"] == 0.8
    assert a[1]["lastmod"] is None and a[1]["priority"] is None
    assert all(r["kind"] == "url" for r in a)
    assert by[1][0]["kind"] == "sitemap"
    assert by[1][0]["loc"] == "https://a.test/sm1.xml"
    assert 2 not in by  # empty urlset emits nothing
    for sid in (3, 4):
        assert len(by[sid]) == 1 and by[sid][0]["kind"] == "invalid"
        assert by[sid][0]["loc"] is None
    # loc-less url skipped; bogus priority -> NULL, loc kept
    assert len(by[5]) == 1
    assert by[5][0]["loc"] == "https://b.test/ok"
    assert by[5][0]["priority"] is None


LINK_HTML = (
    '<html><A HREF="http://other.com/x">1</a>'
    '<a href="//cdn.ex.com/img">2</a>'
    '<a href="/root.html">3</a>'
    '<a href="rel.html#frag">4</a>'
    '<a href="#top">5</a><a href="mailto:x@y.z">6</a>'
    '<a href="JavaScript:void(0)">7</a><a href="">8</a>'
    "<a href='single.html'>9</a></html>"
)


def test_extract_links_resolution_table(spark):
    df = spark.createDataFrame(
        [(1, "https://ex.com/a/b/page.html", LINK_HTML)],
        "doc_id long, url string, html string",
    )
    got = [r.link for r in wb.extract_links(df).collect()]
    # junk (fragment-only, mailto, javascript, empty) dropped; four
    # resolution modes; fragments stripped from resolved links;
    # single-quoted attributes emitted after the double-quoted ones
    assert got == [
        "http://other.com/x",
        "https://cdn.ex.com/img",
        "https://ex.com/root.html",
        "https://ex.com/a/b/rel.html",
        "https://ex.com/a/b/single.html",
    ]


def test_extract_links_keeps_page_columns_one_row_per_link(spark):
    df = spark.createDataFrame(
        [(1, "http://a/", '<a href="/x">l</a><a href="/y">l</a>'),
         (2, "http://b/", "no links here")],
        "doc_id long, url string, html string",
    )
    rows = wb.extract_links(df).collect()
    assert [(r.doc_id, r.link) for r in rows] == [
        (1, "http://a/x"), (1, "http://a/y")]


def test_extract_links_stays_jvm_side(spark):
    df = spark.createDataFrame(
        [(1, "http://a/", LINK_HTML)], "doc_id long, url string, html string"
    )
    plan = wb.extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one extraction per quote style (no inline re-extraction)
    assert plan.count("regexp_extract_all(") == 2


ANCHOR_HTML = (
    '<html><a href="http://t.com/x"> Click <b>here</b> &amp; now </a>'
    "<a href='rel.html'>Rel Link</a>"
    '<a href="mailto:x@y">mail</a>'
    '<a href="/img"><img src="i.png"/></a>'
    '<a class="c" href="http://t.com/x">Click here &amp; now</a>'
    '<a href="http://t.com/x">other\n text</a></html>'
)


def test_extract_anchors_pairs_and_cleaning(spark):
    df = spark.createDataFrame(
        [("http://ex.com/a/p1", ANCHOR_HTML)], "url string, html string"
    )
    got = [(r.link, r.anchor) for r in wb.extract_anchors(df).collect()]
    # double-quoted pairs first, then single-quoted; junk hrefs dropped;
    # inner tags flattened, entities decoded, whitespace collapsed;
    # empty cleaned anchor (image link) KEPT as ''
    assert got == [
        ("http://t.com/x", "Click here & now"),
        ("http://ex.com/img", ""),
        ("http://t.com/x", "Click here & now"),
        ("http://t.com/x", "other text"),
        ("http://ex.com/a/rel.html", "Rel Link"),
    ]


def test_anchor_stats_argmin_and_empty_only_target(spark):
    df = spark.createDataFrame(
        [("http://ex.com/a/p1", ANCHOR_HTML)], "url string, html string"
    )
    rows = {r.link: r for r in wb.anchor_stats(df).collect()}
    t = rows["http://t.com/x"]
    assert (t.n_anchors, t.n_texts, t.top_anchor, t.top_cnt) == (
        3, 2, "Click here & now", 2
    )
    img = rows["http://ex.com/img"]
    # empty-only target: counted, but no top text
    assert (img.n_anchors, img.top_anchor, img.top_cnt) == (1, None, None)


def test_anchor_stats_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame(
        [("http://h/", '<a href="/t">beta</a><a href="/t">alpha</a>')],
        "url string, html string",
    )
    r = wb.anchor_stats(df).collect()[0]
    assert (r.top_anchor, r.top_cnt, r.n_texts) == ("alpha", 1, 2)


def test_extract_anchors_stays_jvm_side_no_window(spark):
    df = spark.createDataFrame(
        [("http://ex.com/", ANCHOR_HTML)], "url string, html string"
    )
    plan = (
        wb.anchor_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan  # argmin via min-of-struct, not a window
    # one scan per (pattern, group): 2 patterns x 2 groups
    assert plan.count("regexp_extract_all(") == 4


def test_resolve_redirect_chains_basic_and_log_rounds(spark):
    from geoharvest_spark.webops import resolve_redirect_chains

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "T"), ("x", "T2")],
        "src string, dst string",
    )
    out = {
        r["src"]: (r["target"], r["hops"])
        for r in resolve_redirect_chains(df).collect()
    }
    assert out == {
        "a": ("T", 4), "b": ("T", 3), "c": ("T", 2), "d": ("T", 1),
        "x": ("T2", 1),
    }
    # a 64-hop chain resolves within 8 doubling rounds (log2, not linear)
    long = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(64)], "src string, dst string"
    )
    res = {
        r["src"]: (r["target"], r["hops"])
        for r in resolve_redirect_chains(long, max_rounds=8).collect()
    }
    assert res["n0"] == ("n64", 64) and res["n63"] == ("n64", 1)


def test_resolve_redirect_chains_cycles_raise(spark):
    import pytest as _pytest

    from geoharvest_spark.webops import resolve_redirect_chains

    for edges in (
        [("p", "q"), ("q", "r"), ("r", "p")],        # odd cycle: no converge
        [("p", "q"), ("q", "p")],                    # even cycle: self-target
        [("s", "s2"), ("s2", "p"), ("p", "q"), ("q", "p")],  # tail into cycle
    ):
        df = spark.createDataFrame(edges, "src string, dst string")
        with _pytest.raises(RuntimeError):
            resolve_redirect_chains(df, max_rounds=6)
    with _pytest.raises(ValueError):
        resolve_redirect_chains(
            spark.createDataFrame(
                [("a", "b"), ("a", "c")], "src string, dst string"
            )
        )

"""Seeded fuzz for the webops Column operators.

Hypothesis-style randomized invariants, but batched: one seeded python
generator builds hundreds of hostile inputs, ONE Spark job evaluates
them, and the invariants are asserted per row (a per-example Spark
round-trip would be ~100ms each)."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from geoharvest_spark import webops as wb


def _fuzz_urls(n: int = 400, seed: int = 20260817) -> list[str]:
    rng = random.Random(seed)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", "a+b-c"]
    hosts = ["Site.com", "WWW.Ex.CO.UK", "a.b.c.org", "localhost",
             "x.com.au", "single"]
    ports = ["", ":80", ":443", ":8080", ":0"]
    paths = ["", "/", "/A/b", "/A/b/", "/x//y", "/%20z", "/a.b"]
    params = ["", "utm_source=1", "page=2", "fbclid=x", "ref=nav", "a=b",
              "utm_x=", "=v", ""]
    frags = ["", "#f", "#a#b", "#"]
    out = []
    for _ in range(n):
        qs = "&".join(p for p in rng.sample(params, rng.randint(0, 4)) if p)
        url = (
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths)
            + (("?" + qs) if qs or rng.random() < 0.2 else "")
            + rng.choice(frags)
        )
        out.append(url)
    return out


def test_canonicalize_fuzz_invariants(spark):
    urls = _fuzz_urls()
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["i", "url"])
    once = wb.with_canonical_url(df).select(
        "i", "url", F.col("canonical_url").alias("c1"), "domain"
    )
    twice = wb.with_canonical_url(
        once.select("i", F.col("c1").alias("url"))
    ).select("i", F.col("canonical_url").alias("c2"))
    rows = once.join(twice, "i").collect()
    assert len(rows) == len(urls)
    for r in rows:
        # idempotent under re-canonicalization
        assert r["c2"] == r["c1"], (r["url"], r["c1"], r["c2"])
        # fragment gone
        assert "#" not in r["c1"], r["url"]
        # authority lowercased
        auth = r["c1"].split("://", 1)[1].split("/", 1)[0]
        assert auth == auth.lower(), r["url"]
        # no tracking params survive
        assert not re.search(r"[?&](utm_[^=]*|fbclid|gclid|ref)=", r["c1"]), (
            r["url"], r["c1"],
        )
        # domain is a suffix of the authority's host part
        host = auth.rsplit(":", 1)[0] if re.search(r":[0-9]+$", auth) else auth
        assert host.endswith(r["domain"]), (r["url"], host, r["domain"])


def test_html_extract_fuzz_never_leaves_tags(spark):
    # tag-structured junk WITHOUT entities ('&lt;tag&gt;' legitimately
    # decodes to a literal '<tag>' in text, so entities are fuzzed apart)
    rng = random.Random(7)
    frag = ["<p>", "</p>", "<SCRIPT>", "</script>", "<style a='b'>",
            "</style>", "<!--", "-->", "<div\nid='x'>", "word", "two words",
            "  ", "<br/>", "<a href='u'>", "</a>", "<unclosed"]
    docs = [
        " ".join(rng.choice(frag) for _ in range(rng.randint(1, 20)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(docs)], ["i", "html"])
    rows = df.select(
        "i", wb.extract_text_from_html(F.col("html")).alias("t")
    ).collect()
    for r, src in zip(sorted(rows, key=lambda x: x["i"]), docs):
        t = r["t"]
        # no well-formed tag survives
        assert not re.search(r"<[A-Za-z!/][^>]*>", t), (src, t)
        # whitespace fully collapsed and trimmed
        assert t == t.strip() and "  " not in t and "\n" not in t, (src, t)


def test_parse_robots_fuzz_stability(spark):
    rng = random.Random(99)
    rule_lines = ["Disallow: /a", "Allow: /a/b", "Disallow: /c",
                  "Disallow:", "Allow:  /sp aced "]
    other = ["Sitemap: https://x/s.xml", "Crawl-delay: 10", "garbage line",
             ": nokey", "Disallow /missingcolon"]
    uas = ["User-agent: *", "User-agent: bot", "USER-AGENT: *"]
    docs = []
    for _ in range(120):
        lines = []
        for _ in range(rng.randint(1, 12)):
            roll = rng.random()
            if roll < 0.3:
                lines.append(rng.choice(uas))
            elif roll < 0.7:
                lines.append(rng.choice(rule_lines))
            else:
                lines.append(rng.choice(other))
        docs.append("\n".join(lines))
    base = spark.createDataFrame(
        [(f"d{i}.com", t) for i, t in enumerate(docs)], ["domain", "robots_txt"]
    )
    rules = wb.parse_robots(base).collect()
    for r in rules:
        assert r["rule"] in ("allow", "disallow")
        assert r["path"] != ""
    # inserting comment-only lines between every line changes nothing
    # (comments are stripped before section grouping, per the standard)
    commented = spark.createDataFrame(
        [
            (f"d{i}.com", "\n".join(
                x for line in t.split("\n") for x in (line, "# noise")
            ))
            for i, t in enumerate(docs)
        ],
        ["domain", "robots_txt"],
    )
    a = sorted(map(tuple, rules))
    b = sorted(map(tuple, wb.parse_robots(commented).collect()))
    assert a == b


def _py_rule_match(path: str, rule: str) -> bool:
    """Pure-python RFC 9309 reference matcher (independent of the Spark
    regex compilation): '*' = any run, trailing '$' = end anchor."""
    anchored = rule.endswith("$")
    body = rule[:-1] if anchored else rule
    segs = body.split("*")
    pos = 0
    # first segment must match at the start
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    for seg in segs[1:-1] if len(segs) > 1 else []:
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    if len(segs) > 1:
        last = segs[-1]
        if anchored:
            return path.endswith(last) and (
                len(path) - len(last) >= pos
            )
        i = path.find(last, pos)
        return i >= 0
    return (path == body) if anchored else True


def test_crawl_wildcard_fuzz_vs_python_reference(spark):
    """Seeded fuzz: random wildcard rules + paths; the Spark evaluator's
    per-(url, single-rule) verdict must equal the pure-python matcher.
    One rule per domain so the longest-match precedence can't mask
    per-rule match differences."""
    rng = random.Random(20260817)
    pieces = ["/a", "/bb", ".php", "/x%20", "/Path", "?p=1", "/日", "/.."]
    rules = []
    for i in range(120):
        body = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 3)))
        # sprinkle stars and optional anchor
        if rng.random() < 0.7:
            k = rng.randrange(len(body))
            body = body[:k] + "*" + body[k:]
        if rng.random() < 0.3:
            body = "*" + body
        if rng.random() < 0.4:
            body += "$"
        if not body.startswith(("/", "*")):
            body = "/" + body
        rules.append((f"d{i}.com", "disallow", body))
    paths = []
    for i in range(120):
        p = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 4)))
        if not p.startswith("/"):
            p = "/" + p
        paths.append(p)
    # every (domain, path) pair where domain's one rule is tested
    urls = [
        (f"d{i}.com", f"https://d{i}.com" + paths[(i * 7 + j) % len(paths)])
        for i in range(120)
        for j in range(3)
    ]
    rdf = spark.createDataFrame(rules, ["domain", "rule", "path"])
    udf = spark.createDataFrame(urls, ["domain", "canonical_url"])
    got = {
        (r["domain"], r["canonical_url"]): r["crawl_allowed"]
        for r in wb.with_crawl_allowed(udf, rdf).collect()
    }
    mismatches = []
    for dom, url in urls:
        rule = next(p for d, _, p in rules if d == dom)
        path = re.sub(r"^[a-z][a-z0-9+.-]*://[^/]*", "", url)
        expect = not _py_rule_match(path, rule)  # disallow rule
        if got[(dom, url)] != expect:
            mismatches.append((dom, rule, path, got[(dom, url)], expect))
    assert not mismatches, mismatches[:10]

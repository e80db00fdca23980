from __future__ import annotations

import hashlib

from geoharvest_spark.mlprep import feature_hash, target_encode


def test_target_encode_matches_manual(spark):
    rows = [
        (1, "a", 10),
        (2, "a", 20),
        (3, "b", 0),
        (4, "b", 100),
        (5, "b", 50),
        (6, "c", 7),
    ]
    df = spark.createDataFrame(rows, "rid long, cat string, y long")
    out = {
        r["rid"]: (r["cat_n"], r["target_enc"])
        for r in target_encode(df, "cat", "y", m=10.0).collect()
    }
    gs, gn = sum(y for *_, y in rows), len(rows)
    g = gs / gn
    per = {}
    for _, c, y in rows:
        s, n = per.get(c, (0, 0))
        per[c] = (s + y, n + 1)
    for rid, c, _ in rows:
        s, n = per[c]
        assert out[rid] == (n, (s + 10.0 * g) / (n + 10.0))
    # shrinkage: the 1-row category sits closer to the global mean than
    # a naive per-category mean would
    assert abs(out[6][1] - g) < abs(7 - g)


def _py_feature_hash(text: str, d: int):
    per = {}
    for tok in text.split():
        if not tok:
            continue
        h = hashlib.md5(tok.encode()).hexdigest()
        idx = int(h[:15], 16) % d
        w = 1 if h[15] in "01234567" else -1
        per[idx] = per.get(idx, 0) + w
    return sorted((i, w) for i, w in per.items() if w != 0)


def test_feature_hash_matches_manual(spark):
    rows = [
        (1, "spark hash trick spark spark"),
        (2, "the quick brown fox"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "rid long, text string")
    got = {
        r["rid"]: ([(s["idx"], s["w"]) for s in r["features"]], r["n_feat"])
        for r in feature_hash(df, d=64).collect()
    }
    for rid, text in rows:
        want = _py_feature_hash(text, 64)
        if not want:
            assert rid not in got  # empty docs produce no feature row
        else:
            assert got[rid] == (want, len(want))


def test_feature_hash_collisions_cancel(spark):
    # with d=1 every token lands in bucket 0; signs must sum
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "rid long, text string"
    )
    [row] = feature_hash(df, d=1).collect()
    want = _py_feature_hash("alpha beta gamma delta epsilon zeta", 1)
    assert [(s["idx"], s["w"]) for s in row["features"]] == want

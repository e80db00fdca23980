"""Text-analysis + deduplication operators for the documents table.

Large-scale training-data-pipeline operators, Spark-first:

- exact dedup: md5 hash-groupBy (one shuffle, map-side combine);
- n-gram Jaccard near-dup: blocked self-join on cheap keys + exact token-set
  Jaccard via array intersection/union (all JVM built-ins);
- MinHash + LSH: vectorized numpy minhash signatures (Arrow batch), banded
  into buckets, candidates = bucket equi-join (no O(n^2) pass);
- SimHash: 64-bit signatures from token hashes, near-dup = same signature
  bucket + Hamming distance <= threshold;
- language id: stopword-marker scoring with JVM-side token matching;
- quality scoring: length / word stats / uppercase & digit ratios;
- token counting: whitespace + BPE-ish subword estimate;
- fingerprinting: order-invariant content fingerprint (md5 of sorted
  distinct tokens) — robust to word reordering.

Determinism: every hash derives from md5/xxhash64 of content — no Python
hash(), no RNG — so retries and resumes reproduce identical results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------
def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (documents.text is single-spaced words)."""
    return F.split(text, r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token & char counts + a BPE-ish subword estimate (~chars/4 heuristic
    blended with word count, the common LLM token estimator)."""
    toks = tokens_col(F.col(text_col))
    return (
        df.withColumn("n_tokens", F.size(toks))
        .withColumn("n_chars_calc", F.length(F.col(text_col)))
        .withColumn(
            "n_subwords_est",
            F.ceil(
                F.length(F.col(text_col)) / F.lit(4.0) * F.lit(0.75)
                + F.size(toks) * F.lit(0.25)
            ).cast("long"),
        )
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics: word count, mean word length, uppercase ratio,
    digit ratio, distinct-token ratio. All JVM expressions (codegen)."""
    toks = tokens_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_upper = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[A-Z]", "")
    )
    n_digit = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[0-9]", "")
    )
    n_tokens = F.size(toks)
    return (
        df.withColumn("n_words", n_tokens)
        .withColumn(
            "mean_word_len",
            (n_chars - (n_tokens - 1)) / n_tokens,  # exact for single-spaced
        )
        .withColumn("upper_ratio", n_upper / n_chars)
        .withColumn("digit_ratio", n_digit / n_chars)
        .withColumn("distinct_ratio", F.size(F.array_distinct(toks)) / n_tokens)
    )


# marker stopwords per language for the n-gram-heuristic language id
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "fr": ["le", "la", "les", "et", "de", "un", "est"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht"],
    "es": ["el", "la", "los", "de", "que", "es", "un"],
}


def with_langid(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language id: count marker-stopword hits per language over
    the token array (JVM array intersect — no UDF), argmax with 'und'
    (undetermined) when nothing matches."""
    toks = F.transform(tokens_col(F.lower(F.col(text_col))), lambda t: t)
    scores = []
    out = df
    for lang, markers in _LANG_MARKERS.items():
        score = F.size(
            F.filter(toks, lambda t: t.isin(*markers))  # noqa: B023
        )
        out = out.withColumn(f"_s_{lang}", score)
        scores.append((lang, f"_s_{lang}"))
    best = F.greatest(*[F.col(c) for _, c in scores])
    pred = F.lit("und")
    for lang, c in reversed(scores):  # earlier langs win ties
        pred = F.when(
            (F.col(c) == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred).drop(*[c for _, c in scores])


def fingerprint_col(text: Column) -> Column:
    """Order-invariant document fingerprint: md5 over sorted distinct
    tokens — identical in DuckDB SQL for oracle checks."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text))))
    )


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------
def exact_dedup(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the smallest key per md5(text).

    groupBy on the hash (one shuffle); survivor choice is deterministic.
    Returns (hash, keep_id, n_dups).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(key_col))
        .groupBy("text_md5")
        .agg(
            F.min(key_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Near-dup pairs by EXACT token-set Jaccard >= threshold.

    Candidates come from unigram MinHash-LSH (bands of r = num_hashes/bands
    rows), then the exact Jaccard — array intersect/union built-ins, bit-
    exact in DuckDB for the oracle — filters them. No blocked self-join
    anywhere: a skewed block key can no longer go O(block^2); the shuffle is
    O(docs * bands) + O(candidates).

    Recall: a pair at Jaccard J is missed with probability (1 - J^r)^bands;
    at the near-dup regime this operator targets (threshold >= ~0.7, r=2,
    b=32) that is < 1e-10 — and the driver's all-pairs DuckDB oracle would
    surface any miss as a hash mismatch.
    """
    base = df.select(
        F.col(key_col).alias("id"),
        F.array_sort(F.array_distinct(tokens_col(F.col(text_col)))).alias("toks"),
    )
    cand = minhash_lsh_pairs(
        df, key_col, text_col, num_hashes=num_hashes, bands=bands, shingle=1
    ).select("id_a", "id_b")
    a = base.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    pairs = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# MinHash: h_i(x) = (a_i * (x mod p) + b_i) mod p over 32-bit token hashes
# from md5 prefixes. p = 2^31-1 (Mersenne) keeps every intermediate product
# < 2^62, so the arithmetic is EXACT in int64 on both numpy and the DuckDB
# oracle (a larger p silently wraps numpy int64 and overflow-errors DuckDB).
_MINHASH_P = (1 << 31) - 1


def _minhash_params(num_hashes: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(seed)
    a = rs.randint(1, _MINHASH_P, size=num_hashes, dtype=np.int64)
    b = rs.randint(0, _MINHASH_P, size=num_hashes, dtype=np.int64)
    return a, b


def _token_hashes(tokens: list[str], cache: dict | None = None) -> np.ndarray:
    """md5-based 32-bit token hashes; `cache` memoizes across docs in a
    batch (corpora share vocabulary, so hit rates are high)."""
    import hashlib

    if cache is None:
        cache = {}
    out = []
    for t in set(tokens):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big")
            cache[t] = h
        out.append(h)
    return np.unique(np.array(out, dtype=np.int64))


def minhash_signatures(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle: int = 2,
) -> DataFrame:
    """(key, signature array<long>) — vectorized minhash over word shingles."""
    a, b = _minhash_params(num_hashes)

    @F.pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        gram_cache: dict[str, int] = {}  # shared across docs in the batch
        for t in texts:
            words = (t or "").split()
            if shingle > 1 and len(words) >= shingle:
                grams = [
                    " ".join(words[i : i + shingle])
                    for i in range(len(words) - shingle + 1)
                ]
            else:
                grams = words
            if not grams:
                out.append([0] * num_hashes)
                continue
            hx = _token_hashes(grams, gram_cache)  # (m,)
            sig = (
                (a[:, None] * (hx[None, :] % _MINHASH_P)) % _MINHASH_P
                + b[:, None]
            ) % _MINHASH_P
            out.append(sig.min(axis=1).tolist())
        return pd.Series(out)

    return df.select(F.col(key_col).alias("id"), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 2,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band, band_hash). Shuffle cost = O(docs * bands), never O(n^2).

    Returns (id_a, id_b, est_jaccard) with est = fraction of matching
    minhashes.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, key_col, text_col, num_hashes, shingle).cache()
    banded = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return cand.withColumn(
        "est_jaccard", matches / F.lit(num_hashes)
    ).select("id_a", "id_b", "est_jaccard")


def simhash_signatures(
    df: DataFrame, key_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash per doc (vectorized bit-vote over md5 token hashes)."""

    @F.pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in texts:
            words = (t or "").split()
            if not words:
                out.append(0)
                continue
            hs = np.array(
                [
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in words
                ],
                dtype=np.uint64,
            )
            # votes MUST be signed: in uint64, a negative vote wraps to a
            # huge positive and `> 0` would set the bit (found by the DuckDB
            # oracle — kept as a regression test there)
            bits = (
                (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)
            ).astype(np.int64)
            votes = (bits * 2 - 1).sum(axis=0)
            sig = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(i)
            out.append(int(sig.view(np.int64)))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(key_col).alias("id"), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dups by SimHash: bucket on 4x16-bit chunks (a pair within
    Hamming<=3 of 64 bits must agree on >=1 of 4 chunks), then exact
    Hamming filter via bit_count(xor)."""
    sigs = simhash_signatures(df, key_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("v"),
            )
            for i in range(4)
        ]
    )
    banded = sigs.withColumn("c", F.explode(chunks)).select(
        "id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.v").alias("v")
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "v"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "v"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["chunk", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

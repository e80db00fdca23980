"""Hashed-feature linear quality classifier — the model-based quality
filter of modern pretraining pipelines (a fastText-style hashed
unigram+bigram bag with a linear score and a threshold), built so every
stage is integer, deterministic, and SQL-replayable:

- **features**: lowercase whitespace tokens; unigrams and
  space-joined bigrams; bucket = ``int(md5(feat)[:15 hex], 16) % dim``
  (60 bits — exact in int64 and in the SQL oracle's UBIGINT; the same
  bridge doc_hash_split uses, textops.py:171).
- **training**: a plain integer perceptron on a deterministic synthetic
  labeled set (pure Python, no Spark, no RNG — sample order and tie
  behavior are fixed), run ONCE driver-side and ``lru_cache``d: the
  weight table is tiny shared config, exactly like the BPE merge table
  (bpe.py) and the IVF coarse quantizer. Integer updates keep every
  weight exact, so inference is bit-identical everywhere.
- **inference**: tokens -> feature buckets (pure codegen: split /
  md5 / conv) -> one explode -> groupBy(doc, bucket) count ->
  broadcast join the sparse nonzero-weight table -> sum(weight*count).
  Order-free integer sums: bit-identical across partitionings and
  cluster sizes, and replayable as SQL over a staged weight parquet.

At 100 TB the explode produces ~2x token count rows per doc; both
aggregations partial-aggregate map-side and the weight table (<= dim
rows) broadcasts, so the whole filter is one shuffle keyed on
(doc, bucket) — no skew hazard (buckets are md5-uniform).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 2**15

# deliberately disjoint token pools: the classifier must find the
# separation itself, but determinism — not ML hardness — is the point
_GOOD_VOCAB = (
    "study analysis method result climate research history theory nature "
    "energy system model data protein market language policy design river "
    "mountain culture science novel music chapter review evidence source"
).split()
_SPAM_VOCAB = (
    "click buy free offer winner deal cheap bonus prize casino viagra "
    "subscribe limited exclusive guaranteed earn cash urgent act now"
).split()


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def bucket_py(feat: str, dim: int = DIM) -> int:
    """Python twin of the engine's feature bucket (md5 60-bit % dim)."""
    return _h(feat) % dim


def featurize_py(text: str) -> list[int]:
    """Python twin of the engine featurization: lowercase whitespace
    tokens, unigrams then bigrams, hashed to buckets (with
    multiplicity)."""
    toks = [t for t in text.lower().split() if t]
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [bucket_py(f) for f in feats]


def synth_labeled_docs(n: int = 400, n_tokens: int = 40):
    """Deterministic labeled training set: doc i is GOOD (label +1)
    when i is even — tokens drawn md5-uniformly from the good pool —
    else SPAM (label -1): a LOW-DIVERSITY repetition of 3 spam tokens
    (the shape of real boilerplate/spam). Pure function of i."""
    out = []
    for i in range(n):
        if i % 2 == 0:
            toks = [
                _GOOD_VOCAB[_h(f"g{i}:{j}") % len(_GOOD_VOCAB)]
                for j in range(n_tokens)
            ]
            out.append((" ".join(toks), 1))
        else:
            pool = [
                _SPAM_VOCAB[_h(f"s{i}:{k}") % len(_SPAM_VOCAB)]
                for k in range(3)
            ]
            toks = [pool[_h(f"b{i}:{j}") % 3] for j in range(n_tokens)]
            out.append((" ".join(toks), -1))
    return out


@lru_cache(maxsize=4)
def train_quality_perceptron(
    dim: int = DIM, epochs: int = 3, n_docs: int = 400
) -> tuple[tuple[int, int], ...]:
    """Integer perceptron over the synthetic labeled set. Fixed sample
    order, fixed epochs, mistake-driven +/-count updates — weights stay
    small exact ints. Returns the SPARSE weight table as a sorted tuple
    of (bucket, weight) pairs (hashable for lru_cache; absent bucket =
    weight 0)."""
    w: dict[int, int] = {}
    samples = [
        (featurize_py(text), label)
        for text, label in synth_labeled_docs(n_docs)
    ]
    for _ in range(epochs):
        for feats, label in samples:
            counts: dict[int, int] = {}
            for b in feats:
                counts[b] = counts.get(b, 0) + 1
            s = sum(w.get(b, 0) * c for b, c in counts.items())
            if (s <= 0 and label > 0) or (s >= 0 and label < 0):
                for b, c in counts.items():
                    w[b] = w.get(b, 0) + label * c
    return tuple(sorted((b, v) for b, v in w.items() if v != 0))


def quality_model_scores(
    df: DataFrame,
    weights: tuple[tuple[int, int], ...] | None = None,
    dim: int = DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the hashed linear model: adds
    ``score`` (exact integer, sum of weight*count over hashed
    unigram+bigram features) and ``pred`` (1 = keep / quality, 0 =
    reject). Docs with no weighted features score 0 -> pred 0 (ties
    reject, matching the trainer's s<=0-is-mistake-for-good rule)."""
    if weights is None:
        weights = train_quality_perceptron(dim)
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        list(weights), "bucket long, w long"
    )

    def bkt(c):
        return (
            F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
            % F.lit(int(dim))
        )

    toked = df.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("_toks"),
    )
    # _toks staged as its own projection: unigram AND bigram transforms
    # reference it (the inline-split trap otherwise re-splits per ref)
    feats = toked.select(
        "_id",
        F.explode(
            F.concat(
                F.transform(F.col("_toks"), bkt),
                F.transform(
                    F.when(
                        F.size("_toks") >= 2,
                        F.sequence(F.lit(1), F.size("_toks") - 1),
                    ).otherwise(F.array().cast("array<int>")),
                    lambda i: bkt(
                        F.concat_ws(
                            " ",
                            F.element_at(F.col("_toks"), i),
                            F.element_at(F.col("_toks"), i + 1),
                        )
                    ),
                ),
            )
        ).alias("bucket"),
    )
    scored = (
        feats.groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(wdf), "bucket")
        .groupBy("_id")
        .agg(F.sum(F.col("w") * F.col("cnt")).cast("long").alias("score"))
    )
    return (
        df.join(scored, F.col(id_col) == scored["_id"], "left")
        .drop("_id")
        .withColumn("score", F.coalesce("score", F.lit(0)).cast("long"))
        .withColumn("pred", (F.col("score") > 0).cast("int"))
    )

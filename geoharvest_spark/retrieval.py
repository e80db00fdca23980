"""Lexical retrieval over the documents table: inverted-index BM25 top-k.

The decontamination / eval-leak tooling of a training-data pipeline needs a
ranked lexical search ("which training docs look like this benchmark
prompt?"), and corpus QA needs ad-hoc relevance queries. This module scores
a fixed query set against the corpus with the BM25 shape (term-frequency
saturation + inverse document frequency + length normalization) expressed
in EXACT INTEGER arithmetic, so per-document scores are order-free sums
(Spark's non-deterministic aggregation order cannot change a bit) and the
DuckDB driver oracle reproduces them exactly — the same trick as
``lm.with_lm_score``'s integer micronats.

Scoring. Classic BM25 uses ``idf(t) = ln((N - df + .5)/(df + .5))`` and
``tfn = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``. Transcendentals are
banned in oracle-compared outputs (engine libm vs DuckDB libm), so the idf
here is the rational surrogate ``w(t) = scale*(N - df + 1) // (df + 1)`` —
same monotone shape (decreasing in df, ~scale*N/df in the rare-term
regime). The saturation term with the textbook constants k1 = 1.2 = 6/5
and b = 3/4 clears denominators exactly: with T = total corpus tokens and
N = corpus docs (so avgdl = T/N),

    tfn = 44*T*tf / (20*T*tf + 6*T + 18*N*dl)

and the per-term contribution is the single integer division

    contrib = (w(t) * 44 * T * tf) div (20*T*tf + 6*T + 18*N*dl).

Overflow: the numerator is bounded by ``scale*N * 44 * T * tf``; with the
default scale=1000 that stays under 2^62 up to ~10^7 docs x 10^3 tokens.
Past that, drop ``scale`` (the ranking is scale-invariant) — DuckDB's
BIGINT multiply errors loudly on overflow, so a violation cannot silently
skew parity.

Plan shape, sized for 100 TB: the query vocabulary is a driver-side
literal, so the corpus scan's exploded token stream is pruned by a
codegen ``isin`` filter BELOW the (doc, term) postings aggregate — the
shuffled postings stream is |query-vocab| wide, never |corpus-vocab|;
document frequencies are one more term-keyed aggregate over that pruned
stream; corpus N/T ride a one-row broadcast crossJoin (no driver
collect); the final top-k is a per-query window over the already tiny
scored stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geoharvest_spark.textops import tokens_col


def bm25_topk(
    df: DataFrame,
    queries: "list[tuple[int, str]]",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1000,
) -> DataFrame:
    """Rank the top ``k`` documents per query by integer-rational BM25.

    ``queries`` is a list of (query_id, query_text); query text is
    whitespace-tokenized with the same tokenizer as the corpus. Returns
    (query_id, rank, doc_id, score_int) with rank 1..k per query, ties
    broken by ascending doc_id. Documents sharing no term with a query
    are absent (never ranked).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    spark = df.sparkSession
    qterms = []
    for qid, qtext in queries:
        for t in str(qtext).split():
            qterms.append((int(qid), t))
    qdf = spark.createDataFrame(qterms, ["query_id", "term"]).dropDuplicates()

    base = df.select(
        F.col(id_col).alias("doc"), tokens_col(F.col(text_col)).alias("_toks")
    )
    # postings restricted to the query vocabulary with a LITERAL isin
    # filter (queries are driver-side literals), so the prune sits below
    # the (doc, term) aggregate's exchange — the scored stream is
    # |query-vocab| postings, never |corpus-vocab|.
    vocab = sorted({t for _, t in qterms})
    # explode_OUTER: a plain explode's generator constraint
    # (size(arr) > 0 AND isnotnull(arr)) pushes below the staging
    # projection and re-evaluates split(text) twice more per row; the
    # outer variant carries no constraint, and the null row it emits for
    # an empty doc drops at the isin filter anyway.
    postings = (
        base.select(
            F.col("doc"),
            F.size("_toks").cast("long").alias("dl"),
            F.explode_outer("_toks").alias("term"),
        )
        .where(F.col("term").isin(vocab))
        .groupBy("doc", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qpost = postings
    dfreq = qpost.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    # corpus stats WITHOUT a second tokenize: size(split(text, '\s+'))
    # (split's default limit -1 keeps trailing empty strings) is exactly
    # the number of '\s+' matches plus one, so regexp_count gives the
    # identical token count with no array materialization — the stats
    # branch re-scanned and re-split the whole corpus just for this sum
    # (guide §2.3: shuffle/compute only what the operator needs).
    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.regexp_count(F.col(text_col), F.lit(r"\s+")) + 1
        ).cast("long").alias("t_tokens"),
    )
    scored = (
        qpost.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qdf), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            F.expr(f"({scale} * (n_docs - dft + 1)) div (dft + 1)"),
        )
        .withColumn(
            "contrib",
            F.expr(
                "(w * 44 * t_tokens * tf) div "
                "(20 * t_tokens * tf + 6 * t_tokens + 18 * n_docs * dl)"
            ),
        )
        .groupBy("query_id", "doc")
        .agg(F.sum("contrib").alias("score_int"))
    )
    # two-stage top-k: a window partitioned by query_id alone collapses
    # to |queries| tasks (one task ranks the whole corpus's scores for a
    # query). Stage 1 ranks within (query_id, doc-hash bucket) — 32x the
    # parallelism — and keeps k per bucket; the global top-k is a subset
    # of the per-bucket top-ks, so stage 2's window sees <= 32*k rows
    # per query. Same (score desc, doc asc) order both stages keeps the
    # result deterministic.
    bucket = F.pmod(F.xxhash64("doc"), F.lit(32))
    w1 = Window.partitionBy("query_id", "bkt").orderBy(
        F.col("score_int").desc(), F.col("doc").asc()
    )
    pruned = (
        scored.withColumn("bkt", bucket)
        .withColumn("r1", F.row_number().over(w1))
        .where(F.col("r1") <= k)
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score_int").desc(), F.col("doc").asc()
    )
    return (
        pruned.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("doc").alias(id_col),
            F.col("score_int").cast("long").alias("score_int"),
        )
    )


# the driver query's fixed query set: mixed common terms (high df — length
# normalization decides) and language-marker rare terms (idf decides).
DRIVER_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "join hash table"),
    (2, "slow scan filter row"),
    (3, "dup merge"),
    (4, "dup"),
    (5, "spark window agg batch"),
)


def bm25_oracle_sql(
    queries: "tuple[tuple[int, str], ...]" = DRIVER_QUERIES,
    k: int = 10,
    scale: int = 1000,
    src: str = "documents",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (same integer-rational scoring)."""
    qvals = ", ".join(
        f"({qid}, '{t}')" for qid, q in queries for t in q.split()
    )
    return (
        f"WITH q(query_id, term) AS (VALUES {qvals}), "
        f"d AS (SELECT doc_id, string_split(text, ' ') AS l FROM {src}), "
        "p0 AS (SELECT doc_id, len(l)::BIGINT AS dl, unnest(l) AS term "
        "FROM d), "
        "post AS (SELECT doc_id, dl, term, count(*)::BIGINT AS tf FROM p0 "
        "WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2, 3), "
        "dfreq AS (SELECT term, count(*)::BIGINT AS dft FROM post "
        "GROUP BY 1), "
        "st AS (SELECT count(*)::BIGINT AS n, "
        "sum(len(l))::BIGINT AS t FROM d), "
        "sc AS (SELECT q.query_id, post.doc_id, "
        f"sum((({scale} * (st.n - dfreq.dft + 1)) // (dfreq.dft + 1) "
        "* 44 * st.t * post.tf) // (20 * st.t * post.tf + 6 * st.t + "
        "18 * st.n * post.dl))::BIGINT AS score_int "
        "FROM post JOIN dfreq USING (term) JOIN q USING (term), st "
        "GROUP BY 1, 2), "
        "r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id "
        "ORDER BY score_int DESC, doc_id ASC)::BIGINT AS rank, doc_id, "
        "score_int FROM sc) "
        f"SELECT query_id, rank, doc_id, score_int FROM r WHERE rank <= {k} "
        "ORDER BY query_id, rank"
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF — the
    keyword-extraction pass a corpus-QA pipeline runs to label clusters
    and spot template domination.

    Integer-exact scoring (oracle discipline): with N = corpus docs,
    tf = term count in the doc, df = docs containing the term, the
    score is the single IEEE division ``(tf * N) / df`` — same ranking
    as tf * (N/df), no logarithm, bit-identical across engines since
    both operands stay far under 2^53. Ties break on the term string.

    Plan: explode tokens (array staged through its own projection) ->
    (doc, term) hash aggregate for tf -> term-keyed aggregate for df ->
    equi-join tf x df on term -> per-doc top-k window over a stream
    already collapsed to distinct (doc, term) rows. Shuffles are keyed
    on term / doc; nothing touches Python.

    Returns (doc_id, term, tf, df, score) — k rows per non-empty doc.
    """
    base = docs.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    # the when(size>0) guard references _toks TWICE so the staging
    # projection survives CollapseProject — with a single reference the
    # explode's inferred not-null/size filter pushes below the alias and
    # re-evaluates split(text) up to 5x per row (plan-pinned at 2: one
    # per scan branch)
    toks_nonempty = F.when(F.size("_toks") > 0, F.col("_toks"))
    terms = base.select(
        F.col(id_col), F.explode(toks_nonempty).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count(F.lit(1)).alias("_n")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("_n")).cast("double") / F.col("df"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.col("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "score")
    )


def phrase_match_counts(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase occurrence counts per document — positional search
    WITHOUT an inverted index: one higher-order filter over the staged
    token array testing all k terms at each start position. NARROW
    (zero shuffles, pure codegen); the index-backed formulation (k-way
    positional-postings self-join) only wins when the corpus is
    re-queried many times — for one-shot scans this IS the fast path.

    Returns (id, n_tokens, n_matches, first_pos) for docs with >= 1
    match; first_pos is the 0-based token index of the first match.
    """
    terms = phrase.split()
    if not terms:
        raise ValueError("empty phrase")
    k = len(terms)
    base = df.select(
        F.col(id_col), tokens_col(F.col(text_col)).alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)

    def hit(i):
        cond = None
        for j, t in enumerate(terms):
            c = F.element_at(toks, i + j + 1) == F.lit(t)
            cond = c if cond is None else (cond & c)
        return cond

    starts = F.when(
        n >= k,
        F.filter(F.sequence(F.lit(0), n - k), lambda i: hit(i)),
    ).otherwise(F.expr("cast(array() as array<int>)"))
    staged = base.select(
        F.col(id_col), n.alias("n_tokens"), starts.alias("_s")
    )
    return staged.where(F.size("_s") > 0).select(
        F.col(id_col),
        "n_tokens",
        F.size("_s").alias("n_matches"),
        F.element_at("_s", 1).alias("first_pos"),
    )

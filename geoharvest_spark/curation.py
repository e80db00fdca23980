"""End-to-end web-corpus curation pipeline (the training-data shape).

Chains the engine's webtext operators into the canonical cleaning order
used by large-scale corpus builds:

1. extract      — HTML boilerplate strip + URL canonicalization
   (+ optional robots stage: drop URLs the domain's robots.txt disallows)
2. url_dedup    — first document per canonical URL
3. quality      — language id + quality-heuristic + repetition filters
4. near_dedup   — MinHash-LSH near-duplicate removal (drop the larger id)
5. chunk_dedup  — sub-document first-wins dedup, reassembled text
6. decontam     — exact n-gram overlap vs a benchmark set
7. split        — deterministic md5-bucket train/val/test, partitioned write

Document-level near-dedup runs BEFORE sub-document chunk dedup on
purpose: chunk dedup shreds a near-duplicate into first-wins fragments,
after which no document-level similarity survives to measure — the same
ordering every production corpus build uses (exact/near dedup at the
document grain first, then paragraph/line-level).

**Every stage materializes to parquet under ``out_dir/stages/<name>``
and the next stage reads that table.** That is deliberately the 100-TB
shape, not an optimization gap: it truncates lineage (no recompute
cascades through seven wide stages), makes each stage independently
restartable (the idempotent-resume story checkpoint.py tells for tiles),
and lets a failed stage re-run without touching upstream outputs. The
inter-stage frames are id+text projections, so the staged bytes stay
proportional to the corpus text.

Per-stage row counts come from ``observe()`` metrics riding each stage's
write action — zero extra jobs (the old per-stage ``count()`` re-scanned
every just-written table, 8 extra jobs per run); each stage's ``rows_in``
is the previous stage's observed ``rows_out``.

Each operator inside a stage is the oracle-checked kernel the driver
contract verifies one by one (see COVERAGE.md); this module only wires
them together and accounts rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import textops as tx
from .webops import (
    extract_text_from_html,
    parse_robots,
    with_canonical_url,
    with_crawl_allowed,
)


@dataclass
class CurationConfig:
    domain_cap: int | None = None  # keep first N docs per domain (None = off)
    redact_pii: bool = False       # scrub emails/IPs/long numbers pre-dedup
    # perplexity filter (CCNet-style): drop docs whose avg bigram cost vs
    # lm_model exceeds this many micronats (None = stage off). The model
    # is trained by the CALLER on trusted text (lm.train_bigram_lm /
    # lm.corpus_lm) — curation never trains on the corpus it filters.
    lm_max_avg_cost: float | None = None
    lm_model: dict | None = None
    # model-based quality gate: drop docs whose hashed-linear-classifier
    # score (qmodel.quality_model_scores, exact integer) is below this.
    # None = stage off. Weights default to the deterministic shared-config
    # perceptron; pass qmodel_weights ((bucket, w) tuples) to use a model
    # trained elsewhere.
    qmodel_min_score: int | None = None
    qmodel_weights: tuple | None = None
    # site-level authority gate: drop docs whose host's integer PageRank
    # over the corpus's own link graph (graph.host_authority, scale 1e9)
    # is below this. An unlinked host scores the teleport base 1.5e8, so
    # thresholds just above it keep only actually-linked sites.
    authority_min: int | None = None
    chunk_tokens: int = 20
    ngram_n: int = 8
    shingle: int = 5
    minhash_threshold: float = 0.8
    min_words: int = 10
    min_distinct_ratio: float = 0.1
    max_dup_gram_frac: float = 0.5
    langs: tuple[str, ...] = ("en",)
    split_weights: tuple[int, ...] = (80, 10, 10)
    split_names: tuple[str, ...] = ("train", "val", "test")
    salt: str = "split"


@dataclass
class CurationReport:
    stages: list[dict] = field(default_factory=list)
    _t_last: float = field(default_factory=time.perf_counter)

    def record(self, name: str, rows_in: int, rows_out: int) -> None:
        now = time.perf_counter()
        self.stages.append(
            {
                "stage": name,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "dropped": rows_in - rows_out,
                "sec": round(now - self._t_last, 2),
            }
        )
        self._t_last = now


def _stage(
    spark: SparkSession, df: DataFrame, out_dir: str, name: str
) -> tuple[DataFrame, int]:
    """Materialize a stage and return (read-back frame, observed row
    count). The count is an observe() metric on the write action itself
    — no second scan of the stage output."""
    path = f"{out_dir}/stages/{name}"
    obs = Observation(f"curation_{name}")
    df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).parquet(path)
    # read back with the EXPLICIT schema: an all-rows-filtered stage
    # writes only _SUCCESS, and schema inference would throw
    # UNABLE_TO_INFER_SCHEMA — an empty corpus must flow through, not
    # crash (and skipping inference saves a job per stage either way)
    return spark.read.schema(df.schema).parquet(path), int(obs.get["rows"])


def curate(
    spark: SparkSession,
    pages: DataFrame,
    bench: DataFrame,
    out_dir: str,
    cfg: CurationConfig | None = None,
    robots: DataFrame | None = None,
) -> tuple[DataFrame, CurationReport]:
    """Run the full curation pipeline.

    ``pages``: (doc_id, url, html); ``bench``: (doc_id, text) — the
    eval/benchmark set to decontaminate against; ``robots``: optional
    (domain, robots_txt) table enabling the crawl-governance stage.
    Returns the final split DataFrame (doc_id, text, split) read back
    from the partitioned output, plus the per-stage row accounting.
    """
    cfg = cfg or CurationConfig()
    rep = CurationReport()

    # 1. extract text + canonical url (narrow, codegen; staged regexps)
    ext = with_canonical_url(pages).select(
        "doc_id",
        "canonical_url",
        "domain",
        extract_text_from_html(F.col("html")).alias("text"),
    )
    ext, n_ext = _stage(spark, ext, out_dir, "extract")
    # extract is a pure projection — rows_in == rows_out by construction,
    # so one observed count covers both sides of the accounting row
    rep.record("extract", n_ext, n_ext)

    # 1b. robots governance (optional): drop URLs the domain's robots.txt
    # disallows for user-agent * (longest-prefix, allow wins ties)
    if robots is not None:
        rules = parse_robots(robots)
        ext = (
            with_crawl_allowed(ext, rules)
            .where(F.col("crawl_allowed"))
            .drop("crawl_allowed")
        )
        ext, n_rob = _stage(spark, ext, out_dir, "robots")
        rep.record("robots", n_ext, n_rob)
        n_ext = n_rob

    # 1b2. host-authority gate (optional): integer PageRank over the
    # corpus's own host->host link graph; docs on hosts below the
    # threshold are dropped. The kept-host set is tiny next to the
    # corpus, so it broadcasts.
    if cfg.authority_min is not None:
        from geoharvest_spark.graph import host_authority
        from geoharvest_spark.webops import host_of

        keep_hosts = (
            host_authority(pages)
            .where(F.col("authority") >= int(cfg.authority_min))
            .select(F.col("host").alias("_host"))
        )
        # canonical_url is already canonical, so host_of alone yields
        # the same host key host_authority derived from the raw URL
        ext = (
            ext.withColumn("_host", host_of(F.col("canonical_url")))
            .join(F.broadcast(keep_hosts), "_host", "left_semi")
            .drop("_host")
        )
        ext, n_auth = _stage(spark, ext, out_dir, "authority")
        rep.record("authority", n_ext, n_auth)
        n_ext = n_auth

    # 1c. per-domain cap (optional): anti-boilerplate guard — keep the
    # first cfg.domain_cap docs per registered domain in doc_id order
    if cfg.domain_cap is not None:
        # re-spread after the cap: the per-key window hash-partitions on
        # the domain, and a low-cardinality domain set (worst case: one
        # registered domain) collapses the stage output to ~1 partition,
        # single-threading every downstream scan (measured 5x on the
        # quality stage). The repartition restores the task grid before
        # the stage write so the staged files read back parallel.
        ext = (
            tx.cap_per_key(ext, "domain", cfg.domain_cap)
            .where(F.col("kept"))
            .drop("kept")
            .repartition(spark.sparkContext.defaultParallelism)
        )
        ext, n_cap = _stage(spark, ext, out_dir, "domain_cap")
        rep.record("domain_cap", n_ext, n_cap)
        n_ext = n_cap

    # 2. URL-level dedup: deterministic first doc per canonical URL
    keeper = ext.groupBy("canonical_url").agg(F.min("doc_id").alias("doc_id"))
    url_d = ext.join(keeper, ["canonical_url", "doc_id"]).select(
        "doc_id", "text"
    )
    url_d, n_url = _stage(spark, url_d, out_dir, "url_dedup")
    rep.record("url_dedup", n_ext, n_url)

    # 3. quality + language + repetition filters
    q = tx.with_quality(tx.with_langid(url_d))
    q = q.where(
        F.col("lang_pred").isin(*cfg.langs)
        & (F.col("n_words") >= cfg.min_words)
        & (F.col("distinct_ratio") >= cfg.min_distinct_ratio)
    )
    # NOTE: repetition_stats emits no row for docs with < 2 tokens, so the
    # semi-join drops them here too — unreachable under the default
    # min_words=10 gate above, but a 1-token doc would not survive a
    # custom cfg with min_words <= 1 (single-token pages are noise anyway)
    repo = tx.repetition_stats(q).where(
        F.col("dup_gram_frac") <= cfg.max_dup_gram_frac
    )
    q = q.join(repo.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id", "text"
    )
    q, n_q = _stage(spark, q, out_dir, "quality")
    rep.record("quality", n_url, n_q)

    # 3a2. perplexity filter (optional): score vs the caller-trained
    # bigram LM and drop the high-cost tail; zero-bigram docs pass (the
    # min_words gate owns that policy). Integer micronat costs keep the
    # stage deterministic across resumes/cluster sizes.
    if cfg.lm_max_avg_cost is not None:
        if cfg.lm_model is None:
            raise ValueError(
                "lm_max_avg_cost set but lm_model is None — train one "
                "with lm.train_bigram_lm on trusted text"
            )
        from .lm import with_lm_score

        scores = with_lm_score(q, cfg.lm_model).where(
            (F.col("n_bigrams") == 0)
            | (F.col("avg_cost_micronats") <= cfg.lm_max_avg_cost)
        )
        q = q.join(scores.select("doc_id"), "doc_id", "left_semi")
        q, n_lm = _stage(spark, q, out_dir, "lm_filter")
        rep.record("lm_filter", n_q, n_lm)
        n_q = n_lm

    # 3a2. model-based quality gate (optional): hashed linear classifier
    # score (integer, broadcast weight join) — the fastText-style filter
    # stage of real pretraining pipelines, after the heuristic gate
    if cfg.qmodel_min_score is not None:
        from .qmodel import quality_model_scores

        q = (
            quality_model_scores(q, weights=cfg.qmodel_weights)
            .where(F.col("score") >= int(cfg.qmodel_min_score))
            .select("doc_id", "text")
        )
        q, n_qm = _stage(spark, q, out_dir, "model_quality")
        rep.record("model_quality", n_q, n_qm)
        n_q = n_qm

    # 3b. PII scrub (optional): redact emails / dotted quads / long digit
    # runs BEFORE dedup so near-dup decisions see the scrubbed text a
    # trained model would; row count is unchanged by construction
    if cfg.redact_pii:
        q = tx.redact_pii(q).select("doc_id", "text")
        q, n_pii = _stage(spark, q, out_dir, "pii")
        rep.record("pii", n_q, n_pii)
        n_q = n_pii

    # 4. near-duplicate removal: MinHash-LSH over 5-gram SHINGLES at the
    # configured Jaccard threshold, then distributed connected components
    # (large-star/small-star) over the pair graph — keep the minimum
    # doc_id of each component. Transitive structures (A~B, B~C with no
    # A~C pair; v-structures A~C, B~C) cluster correctly where the old
    # greedy drop-id_b pass could over- or under-drop.
    # Shingled, not unigram: token-SET similarity saturates on any
    # small-vocabulary corpus (every pair looks like a near-dup), while
    # the shingle space grows as vocab^n and only true re-use collides.
    pairs = (
        tx.minhash_lsh_pairs(q, shingle=cfg.shingle)
        .where(F.col("est_jaccard") >= cfg.minhash_threshold)
        .select("id_a", "id_b")
    )
    comp = tx.connected_components(pairs)
    drop = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    nd = q.join(drop, "doc_id", "left_anti")
    nd, n_nd = _stage(spark, nd, out_dir, "near_dedup")
    rep.record("near_dedup", n_q, n_nd)

    # 5. sub-document chunk dedup (keeps reassembled text; fully-deduped
    # docs — n_kept == 0 — drop out here)
    cd = tx.chunk_dedup(
        nd, chunk_tokens=cfg.chunk_tokens, emit_text=True
    ).where(F.col("n_kept") > 0)
    cd = cd.select("doc_id", F.col("dedup_text").alias("text"))
    cd, n_cd = _stage(spark, cd, out_dir, "chunk_dedup")
    rep.record("chunk_dedup", n_nd, n_cd)

    # 6. decontamination vs the benchmark set
    flags = tx.contamination_stats(cd, bench, n=cfg.ngram_n)
    clean = cd.join(
        flags.where(~F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    clean, n_clean = _stage(spark, clean, out_dir, "decontam")
    rep.record("decontam", n_cd, n_clean)

    # 7. deterministic split + partitioned write (the final table layout:
    # readers prune by split directory)
    final = tx.hash_split(
        clean,
        weights=cfg.split_weights,
        names=cfg.split_names,
        salt=cfg.salt,
    )
    obs = Observation("curation_split_write")
    final.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
        "overwrite"
    ).partitionBy("split").parquet(f"{out_dir}/corpus")
    out = spark.read.schema(final.schema).parquet(f"{out_dir}/corpus")
    rep.record("split_write", n_clean, int(obs.get["rows"]))
    return out, rep

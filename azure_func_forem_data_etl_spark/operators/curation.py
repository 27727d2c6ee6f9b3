"""Training-data curation pipeline: the end-to-end composition the
LLM-data north star exists for (SURVEY.md §2b) — quality filter -> exact
dedup -> near-dup dedup -> deterministic split — expressed as one
declarative DataFrame chain so Catalyst fuses the scan/filter/project
stages and the only shuffles are the dedup aggregations themselves.

Stage order matters at 100 TB: quality scoring is a map-only pass and
runs FIRST so every later (shuffling) stage sees a smaller corpus;
exact dedup (32-byte hash shuffle) runs before MinHash so near-dup
bucketing never wastes work on byte-identical copies.

The SQL-expressible prefix (quality + exact dedup + split) is
oracle-checked as ``curation_doc_status``; the full pipeline including
the MinHash near-dup stage is ``curation_pipeline_summary`` (rows-only:
engine-specific hashes, invariants unit-tested in tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.operators.ckpt import scoped_checkpoint
from azure_func_forem_data_etl_spark.operators.text import _SW_SQL, _hits, STOPWORDS
from azure_func_forem_data_etl_spark.functions.textfold import (
    SQL_SPLIT_FOLDED,
    SQL_SPLIT_TEXT,
    WS_RE,
    ascii_fold,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    entity_table,
    table,
)

QUALITY_THRESHOLD = 0.25  # drops the bottom ~quartile of the test corpus


def _split_expr(id_col: str) -> F.Column:
    """75/12.5/12.5 split from the md5 hex nibble of the stable id —
    engine-portable and rerun-stable (same rule as dataset_split_hash)."""
    hx = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    return (
        F.when(hx.between("0", "b"), "train")
        .when(hx.isin("c", "d"), "val")
        .otherwise("test")
    )


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinned (doc_id, text, qs, n_words) at the canonical grain — the
    shared input of the curation prefix; see doc_status for the pin
    rationale."""
    docs = entity_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    nw = F.size(words)
    qs_raw = (
        0.5 * (_hits("split(text, ' ')", STOPWORDS) / nw)
        + 0.3 * F.least(nw / 100.0, F.lit(1.0))
        + 0.2 * (F.size(F.array_distinct(words)) / nw)
    )
    return docs.select(
        "doc_id",
        "text",
        F.when(nw > 0, F.round(qs_raw, 6)).alias("qs"),
        F.when(nw > 0, nw).alias("n_words"),
    ).localCheckpoint(eager=True)


def doc_status(
    spark: SparkSession, sf_dir: str, d: DataFrame | None = None
) -> DataFrame:
    """(doc_id, quality_score, status, split): the SQL-expressible pipeline
    prefix.  status ∈ {low_quality, exact_dup, kept}; split only for kept.
    Exact dedup runs among quality survivors (keep min doc_id per md5).
    ``d`` lets a caller that already pinned the scored frame
    (curation_pipeline_summary) share it instead of pinning twice.

    The quality score is computed INLINE on the scan (same formula as
    ``text_quality_score``) rather than joining that query's output back
    on doc_id: both sides of that join were the same documents scan, so
    inlining deletes a full-corpus self-join + shuffle from the plan.
    Empty docs get NULL qs/n_words via the CASE guard — identical to the
    left join against the size>0-filtered quality output.

    r13 optimization: the scored frame is pinned with an eager
    ``localCheckpoint`` — it feeds THREE plan branches (the rep-group
    aggregation, the rep join's probe side, and the final status join),
    and without the pin each branch re-derived the canonical
    scan+exchange+min_by chain AND re-evaluated the split/array quality
    expression in its filters (the doc_id join's IsNotNull pushdown made
    the branches non-identical, so ReuseExchange couldn't dedup them:
    3 scans + 3 canonical exchanges + 3 SortAggregates observed in the
    before-plan).  One derivation, computed per invocation."""
    if d is None:
        # canonical doc grain (r13 dup-entity leg; oracle chain mirrors)
        d = _scored_docs(spark, sf_dir)
    # Compute the content fingerprint ONCE and carry it as a column: the
    # rep-join then keys on a column reference instead of re-hashing the
    # full text on both join sides (one md5 pass over the corpus, not two).
    passing = d.filter(F.col("qs") >= QUALITY_THRESHOLD).withColumn(
        "fp", F.md5("text")
    )
    reps = passing.groupBy("fp").agg(F.min("doc_id").alias("rep_id"))
    with_rep = passing.join(reps, "fp", "left")
    status = (
        d.join(with_rep.select("doc_id", "rep_id"), "doc_id", "left")
        .withColumn(
            "status",
            F.when(F.col("qs").isNull() | (F.col("qs") < QUALITY_THRESHOLD), "low_quality")
            .when(F.col("doc_id") != F.col("rep_id"), "exact_dup")
            .otherwise("kept"),
        )
    )
    return status.select(
        "doc_id",
        F.col("qs").alias("quality_score"),
        "status",
        F.when(F.col("status") == "kept", _split_expr("doc_id")).alias("split"),
        "n_words",
    )


# Shared oracle CTE chain for the SQL-expressible pipeline prefix; ends in
# a ``docstat`` relation with (doc_id, quality_score, status, split, n_words).
_DOC_STATUS_SQL_CTES = f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    -- ^ canonical doc grain (r13 dup-entity leg): one row per doc_id
    q AS (
        SELECT doc_id, n_words,
               round(0.5 * stopword_ratio
                 + 0.3 * least(n_words / 100.0, 1.0)
                 + 0.2 * (n_distinct_words / n_words), 6) AS qs
        FROM (
            SELECT doc_id,
                   len(words) AS n_words,
                   len(list_distinct(words)) AS n_distinct_words,
                   len(list_filter(words, w -> w IN ({_SW_SQL}))) / len(words) AS stopword_ratio
            FROM (SELECT doc_id, text, string_split(text, ' ') AS words
                  FROM documents_canon)
            WHERE len(words) > 0
        )
    ),
    d AS (
        SELECT doc.doc_id, doc.text, q.qs, q.n_words
        FROM documents_canon doc LEFT JOIN q ON doc.doc_id = q.doc_id
    ),
    passing AS (SELECT doc_id, text FROM d WHERE qs >= {QUALITY_THRESHOLD}),
    reps AS (SELECT md5(text) AS fp, MIN(doc_id) AS rep_id FROM passing GROUP BY md5(text)),
    status AS (
        SELECT d.doc_id, d.qs, d.n_words,
               CASE WHEN d.qs IS NULL OR d.qs < {QUALITY_THRESHOLD} THEN 'low_quality'
                    WHEN d.doc_id <> r.rep_id THEN 'exact_dup'
                    ELSE 'kept' END AS status
        FROM d LEFT JOIN passing p ON d.doc_id = p.doc_id
               LEFT JOIN reps r ON md5(p.text) = r.fp
    ),
    docstat AS (
        SELECT doc_id, qs AS quality_score, status,
               CASE WHEN status = 'kept' THEN
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) BETWEEN '0' AND 'b' THEN 'train'
                        WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c', 'd') THEN 'val'
                        ELSE 'test' END
               END AS split,
               n_words
        FROM status
    )
"""


@register(
    "curation_doc_status",
    oracle=f"""
    {_DOC_STATUS_SQL_CTES}
    SELECT doc_id, quality_score, status, split, n_words FROM docstat
    """,
    doc="Curation pipeline prefix: quality filter -> exact dedup (among "
    "survivors, keep min id) -> split assignment; one status row per doc.",
)
def curation_doc_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_status(spark, sf_dir)


@register(
    "curation_summary_no_neardup",
    oracle=f"""
    {_DOC_STATUS_SQL_CTES}
    SELECT CASE WHEN status <> 'kept' THEN status ELSE split END AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(COALESCE(n_words, 0)) AS BIGINT) AS n_words_total
    FROM docstat
    GROUP BY CASE WHEN status <> 'kept' THEN status ELSE split END
    """,
    doc="Curation funnel counts WITHOUT the near-dup stage — the "
    "hash-checkable twin of curation_pipeline_summary (which stays "
    "rows-only because MinHash bucket hashes are engine-specific).",
)
def curation_summary_no_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same per-bucket doc/word counts as ``curation_pipeline_summary``
    minus the MinHash near-dup stage, so the funnel arithmetic (quality
    drop, exact-dup drop, split fractions) gets full value-hash oracle
    coverage; the near-dup delta on top is covered by the rows-only twin
    plus the recall unit tests."""
    status = doc_status(spark, sf_dir)
    return (
        status.withColumn(
            "bucket",
            F.when(F.col("status") != "kept", F.col("status")).otherwise(
                F.col("split")
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("n_words", F.lit(0))).alias("n_words_total"),
        )
    )


def _curation_full_oracle() -> str:
    """DuckDB replay of the FULL funnel: the doc_status prefix (the same
    CTEs as curation_summary_no_neardup), then the MinHash-LSH + connected
    components near-dup stage over kept docs via the bit-exact xxhash64
    replay (dedup._minhash_sig_band_ctes) — the stage that kept this query
    rows-only through r7."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        _MINHASH_PAIRS_CTES,
        _materialize_ctes,
        _minhash_sig_band_ctes,
    )

    prefix = _DOC_STATUS_SQL_CTES.strip()
    assert prefix.startswith("WITH ")
    # multi-referenced pipeline CTEs materialized (same rationale as the
    # CC oracle — measured 4.9s→3.0s at sf0.01, r9 ask #5)
    return _materialize_ctes(
        f"""
    WITH RECURSIVE {prefix[len('WITH '):]},
    keptdocs AS (
        SELECT d.doc_id, d.text
        FROM docstat s JOIN documents_canon d ON d.doc_id = s.doc_id
        WHERE s.status = 'kept'
    ),
    {_minhash_sig_band_ctes(source="keptdocs")},
    {_MINHASH_PAIRS_CTES},
    und AS MATERIALIZED (
        SELECT doc_a AS s, doc_b AS dd FROM verified
        UNION SELECT doc_b, doc_a FROM verified
    ),
    reach(id, r) AS (
        SELECT s, s FROM und
        UNION
        SELECT u.dd, reach.r FROM reach JOIN und u ON u.s = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    losers AS (SELECT id AS doc_id FROM comp WHERE id <> comp)
    SELECT CASE WHEN l.doc_id IS NOT NULL THEN 'near_dup'
                WHEN s.status <> 'kept' THEN s.status
                ELSE s.split END AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(COALESCE(s.n_words, 0)) AS BIGINT) AS n_words_total
    FROM docstat s LEFT JOIN losers l ON l.doc_id = s.doc_id
    GROUP BY 1
    """,
        "verified",
        "ann",
        "sh",
        "sizes",
    )


@register(
    "curation_pipeline_summary",
    oracle=_curation_full_oracle(),
    doc="Full curation pipeline incl. MinHash near-dup dedup: per-status "
    "doc and word counts (train/val/test/low_quality/exact_dup/near_dup).",
)
def curation_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation funnel in one result: how many docs each stage
    dropped and what survived into each split.  The near-dup stage runs
    MinHash-LSH + connected components over the kept docs only (the
    smallest corpus any stage sees) and keeps one representative (min
    doc_id) per duplicate cluster."""
    from azure_func_forem_data_etl_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    # r13: the pinned scored frame is shared with doc_status AND supplies
    # the kept docs' text — previously the near-dup stage re-scanned the
    # RAW documents table for text, which both cost a second scan+join
    # and (on duplicate-id inputs) shingled an engine-arbitrary physical
    # row where the oracle shingles the canonical one.  Reading the
    # pinned canonical text is faster and exactly the oracle's keptdocs
    # (docstat JOIN documents_canon).
    d = _scored_docs(spark, sf_dir)
    # doc_status is consumed twice (kept-set below, final bucket join) and
    # recomputes the dedup join each time — materialize it once; it is one
    # short row per doc.
    status = doc_status(spark, sf_dir, d=d).localCheckpoint(eager=True)
    kept = status.filter(F.col("status") == "kept").select("doc_id", "split", "n_words")
    kept_docs = kept.join(d.select("doc_id", "text"), "doc_id")
    pairs = minhash_lsh_pairs(kept_docs)
    comp = connected_components(pairs, "doc_a", "doc_b")
    neardup_losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    final = (
        status.join(neardup_losers.withColumn("_nd", F.lit(1)), "doc_id", "left")
        .withColumn(
            "bucket",
            F.when(F.col("_nd") == 1, "near_dup")
            .when(F.col("status") != "kept", F.col("status"))
            .otherwise(F.col("split")),
        )
    )
    return (
        final.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("n_words", F.lit(0))).alias("n_words_total"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing (concat-then-chunk pretraining windows)

PACK_BUDGET_TOKENS = 512


@register(
    "sequence_packing_greedy",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, source,
               len({SQL_SPLIT_TEXT}) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_tokens
        FROM t
    )
    SELECT source,
           CAST(floor((cum_tokens - n_tokens)
                      / {PACK_BUDGET_TOKENS}) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total
    FROM c
    GROUP BY source, CAST(floor((cum_tokens - n_tokens)
                                / {PACK_BUDGET_TOKENS}) AS BIGINT)
    """,
    doc=f"Sequence packing: per-source token cumsum chunked into "
    f"{PACK_BUDGET_TOKENS}-token pretraining windows (concat-then-chunk).",
)
def sequence_packing_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pretraining dataloader's packing step as a query: documents
    concatenate in a deterministic order and cut into fixed token-budget
    windows; a doc belongs to the pack where it STARTS (boundary docs
    straddle, as in real concat-then-chunk loaders).

    Packing is per-source, not global: the cumulative sum needs an
    ordered sequential pass, and a per-source window keeps that pass
    parallel across sources (a single global ORDER BY would serialize
    100 TB through one task chain).  All-integer math — engine-exact."""
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.size(F.split("text", WS_RE)).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    pack = (
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_BUDGET_TOKENS)
    ).cast("long")
    return (
        c.groupBy("source", pack.alias("pack_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens_total"),
        )
    )


# ---------------------------------------------------------------------------
# language-mixture sampling (deterministic per-lang keep rates)

MIXTURE_KEEP_PCT = {"en": 50, "de": 90, "es": 90, "fr": 90, "zh": 100}
MIXTURE_DEFAULT_PCT = 100


def _mix_sql_case() -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(MIXTURE_KEEP_PCT.items())
    )
    return f"CASE {arms} ELSE {MIXTURE_DEFAULT_PCT} END"


@register(
    "mixture_sampling_weighted",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN CAST(('0x' || substring(
                        md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100
                         < {_mix_sql_case()} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept
    FROM documents
    GROUP BY lang
    """,
    doc="Data-mixture rebalancing: deterministic per-language keep rates "
    "from an md5 bucket of the doc id (rerun- and engine-stable).",
)
def mixture_sampling_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting — the step that turns a raw crawl into a
    training mixture (downsample over-represented languages, keep all of
    the scarce ones).  The keep decision is a pure function of
    (doc_id, lang): an md5 bucket in [0,100) compared to the per-lang
    rate — the same engine-portable-hash discipline as
    ``dataset_split_hash``, so the sampled set is reproducible anywhere
    and stable under repartitioning.  Map-only + one tiny aggregate."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    rate = F.lit(MIXTURE_DEFAULT_PCT)
    for k, v in sorted(MIXTURE_KEEP_PCT.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((bucket < rate).cast("int")).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs held-out split)

DECONTAM_NGRAM = 5

#: Shared by the exact operator and the bloom-prefilter variant — the
#: prefilter has no false negatives and exact-confirms survivors, so both
#: produce byte-identical output.
_DECONTAM_ORACLE_SQL = rf"""
    WITH split AS (
        SELECT doc_id, text,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         BETWEEN '0' AND 'b' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('c', 'd') THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    grams AS (
        SELECT doc_id, split,
               UNNEST(list_transform(
                   range(1, len({SQL_SPLIT_FOLDED})
                            - {DECONTAM_NGRAM} + 2),
                   i -> array_to_string(
                       list_slice({SQL_SPLIT_FOLDED},
                                  i, i + {DECONTAM_NGRAM} - 1), ' ')))
                   AS gram
        FROM split
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE split = 'test')
    SELECT g.doc_id,
           COUNT(DISTINCT g.gram) AS n_contaminated_grams
    FROM grams g JOIN bench b ON g.gram = b.gram
    WHERE g.split = 'train'
    GROUP BY g.doc_id
    """


@register(
    "decontamination_ngram_overlap",
    oracle=_DECONTAM_ORACLE_SQL,
    doc=f"Benchmark decontamination: train docs sharing any "
    f"{DECONTAM_NGRAM}-gram with the held-out test split, with overlap "
    "counts.",
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination pass every serious pretraining corpus runs
    (public methodology: GPT-3 appendix C, The Pile, FineWeb): flag
    training documents that share word n-grams with held-out benchmark
    text.  Here the "benchmark" is the corpus's own md5-hash test split,
    so the whole check is self-contained and oracle-verifiable.

    Scale shape: the benchmark gram set is (test fraction × grams/doc) —
    ≪ corpus — and BROADCASTS into the train-side join, so the train
    corpus never shuffles; per-doc counts aggregate on doc_id.  N-grams
    are built by a JVM transform over the split array (no Python)."""
    grams = _decontam_grams(spark, sf_dir)
    bench = (
        grams.filter(F.col("split") == "test").select("gram").distinct()
    )
    return (
        grams.filter(F.col("split") == "train")
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated_grams"))
    )


def _decontam_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, split, gram): overlapping DECONTAM_NGRAM-word grams per doc
    with the md5-hash train/val/test split attached.

    Docs shorter than the gram width yield no grams (the ``size(ws) >= n``
    filter; ``sequence(1, 0)`` would otherwise DESCEND in Spark and emit
    bogus partial grams — the oracle's ``range(1, 0)`` is empty)."""
    docs = table(spark, sf_dir, "documents")
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    n = DECONTAM_NGRAM
    split = docs.select(
        "doc_id",
        F.when(hx.between("0", "b"), "train")
        .when(hx.isin("c", "d"), "val")
        .otherwise("test")
        .alias("split"),
        F.split(ascii_fold("text"), WS_RE).alias("ws"),
    ).filter(F.size("ws") >= n)
    return split.select(
        "doc_id",
        "split",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(ws) - {n} + 1),"
                f" i -> array_join(slice(ws, i, {n}), ' '))"
            )
        ).alias("gram"),
    )


#: Bloom sizing: 2^19 bits (64 KiB) holds ~50k grams at ~1% false-positive
#: with BLOOM_K=5 probes — the sf0.1 benchmark-split gram count.  At 100 TB
#: the bitmap grows with the BENCHMARK (fixed, small), not the corpus.
BLOOM_M_BITS = 1 << 19
BLOOM_K = 5
#: Hard cap on the benchmark side before the driver builds the bitmap —
#: the same loud-failure discipline as operators._guards.
BLOOM_MAX_BENCH_GRAMS = 2_000_000


def _bloom_positions(gram: F.Column) -> list[F.Column]:
    """BLOOM_K bit positions for a gram: xxhash64 seeded by probe index.
    Used identically at build (benchmark side) and probe (train side), so
    membership is exact-by-construction for true entries."""
    return [
        F.pmod(F.xxhash64(gram, F.lit(i)), F.lit(BLOOM_M_BITS))
        for i in range(BLOOM_K)
    ]


@register(
    "decontamination_bloom_prefilter",
    oracle=_DECONTAM_ORACLE_SQL,
    doc="Benchmark decontamination with a bloom-filter prefilter: train "
    "grams probe a 64 KiB bitmap built from benchmark grams, and only "
    "bloom survivors reach the exact broadcast join — output is "
    "byte-identical to decontamination_ngram_overlap (no false negatives).",
)
def decontamination_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB shape of decontamination: when the benchmark gram set
    outgrows a comfortable broadcast hash table, a bloom bitmap stays
    64 KiB forever (the join-pruning bloom-filter idea production Spark
    engines apply internally — cf. "New Query Optimization Techniques in
    the Spark Engine of Azure Synapse", VLDB 2021 — surfaced here as an
    explicit, oracle-checkable operator).  Train-side grams are pre-filtered by K pure-JVM
    bitmap probes (xxhash64 + getbit on an array<long> literal — single
    Literal node, no Python, no shuffle), and only the ~1% surviving
    candidates hit the exact broadcast join that removes bloom false
    positives.  No false negatives by construction, so the output equals
    the exact operator's and shares its DuckDB oracle.

    Driver cost is bounded: the position transfer is K ints per distinct
    benchmark gram (numpy dedups driver-side), and a loud guard refuses
    benchmark sides past BLOOM_MAX_BENCH_GRAMS.

    r14 (guide §1.1 measure first): the r13 Kirsch-Mitzenmacher
    double-hash probes were REVERTED to the {BLOOM_K} independent seeded
    hashes after a matched A/B — KM's shared h1/h2 draws sit inside the
    probe AND-chain's conditional branches, where Spark's subexpression
    elimination does not apply (conditionally-evaluated expressions are
    excluded from CSE), so each conjunct re-derived both hashes and the
    "2 hashes instead of {BLOOM_K}" claim executed as ~2×{BLOOM_K}.
    Measured at sf0.1: independent-seed ×0.76-0.88 vs KM on the same
    shapes, realized FPR identical (survivors 2814 vs 2797 of 185k train
    grams).  Build and probe share ``_bloom_positions``, so membership
    stays exact for true entries and the output (post exact-confirm) is
    unchanged — and the scheme is again the one ``bloom_fpr_audit``
    audits.

    r14 driver-action fold (guide §1.2 — fewer sequential jobs): the
    guard count and the distinct-positions shuffle+collect merged into
    ONE light Arrow transfer — every distinct gram emits exactly
    {BLOOM_K} array slots, so ``n_bench == len(positions) / {BLOOM_K}``
    and numpy dedups driver-side (≤ {BLOOM_K}·bench-grams ints, ~10 MB at
    the guard bound).  4 driver actions → 3 (bench pin, position
    transfer, main pass)."""
    grams = _decontam_grams(spark, sf_dir)
    # The benchmark side feeds BOTH remaining consumers (position
    # transfer, exact-confirm join) — materialize it once instead of
    # re-deriving grams from the corpus scan each time.  It is small by
    # definition (the guard below enforces that).
    bench = (
        grams.filter(F.col("split") == "test")
        .select("gram")
        .distinct()
        .localCheckpoint()
    )

    # Arrow transfer (toPandas), not row-by-row collect(): py4j row
    # conversion at this size costs seconds, Arrow costs milliseconds.
    # No .distinct() before the transfer: the dedup shuffle costs more
    # than moving K ints per gram, and the same rows carry the guard
    # count for free.
    pos_raw = (
        bench.select(
            F.explode(F.array(*_bloom_positions(F.col("gram")))).alias("pos")
        )
        .toPandas()["pos"]
        .to_numpy()
    )
    n_bench = len(pos_raw) // BLOOM_K
    if n_bench > BLOOM_MAX_BENCH_GRAMS:
        raise ValueError(
            f"decontamination_bloom_prefilter: benchmark side has {n_bench} "
            f"grams, above BLOOM_MAX_BENCH_GRAMS={BLOOM_MAX_BENCH_GRAMS}; "
            "grow BLOOM_M_BITS before trusting the false-positive rate."
        )
    import numpy as np

    positions = np.unique(pos_raw)

    words_u = np.zeros(BLOOM_M_BITS // 64, dtype=np.uint64)
    np.bitwise_or.at(
        words_u,
        positions >> 6,
        np.left_shift(np.uint64(1), (positions & 63).astype(np.uint64)),
    )
    # The bitmap literal is authored as SQL text and parsed JVM-side:
    # F.lit(list) marshals 8k elements one py4j call each (~4 s); an
    # array(...) SQL expression crosses the bridge as ONE string and
    # ConstantFolding collapses it to a single array Literal.
    #
    # r14 (guide §1.1): the probe is ONE ``forall`` over the K positions
    # with a SINGLE bitmap reference, not an AND chain of K getbit
    # conjuncts each embedding its own copy of the literal — the 8192-
    # element array appeared 5× in the expression tree and every fresh
    # invocation paid >1 s of analyze/optimize walking ~40k literal
    # nodes (measured: plan build 2.36 s → 0.30 s, full fresh run
    # 2.60 s → 1.31 s, identical 263 output rows).  The transform lambda
    # reproduces ``_bloom_positions`` exactly: ``xxhash64(gram, i)`` with
    # an int32 ``i`` (sequence() elements match ``F.lit(i)``'s type), so
    # build and probe still share the derivation bit-for-bit.
    words = words_u.view(np.int64)  # two's-complement reinterpretation
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    might_contain = F.expr(
        f"forall(transform(sequence(0, {BLOOM_K - 1}), "
        f"i -> pmod(xxhash64(gram, i), {BLOOM_M_BITS})), "
        f"p -> getbit(element_at({arr_sql}, cast(shiftright(p, 6) as int) + 1), "
        f"cast(p % 64 as int)) = 1)"
    )

    return (
        grams.filter(F.col("split") == "train")
        .filter(might_contain)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_contaminated_grams"))
    )


@register(
    "grouped_split_leakage_safe",
    oracle="""
    SELECT source,
           CASE WHEN substring(md5(source), 1, 1)
                     BETWEEN '0' AND 'b' THEN 'train'
                WHEN substring(md5(source), 1, 1) IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Group-aware train/val/test split: the WHOLE source is assigned "
    "one split by hashing the source key (not the doc id), so no source "
    "straddles splits — the leakage-safe counterpart of "
    "dataset_split_hash.",
)
def grouped_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splitting by document id leaks: near-identical docs from one
    domain land on both sides of the train/test fence.  Hashing the GROUP
    key (source/domain/author) assigns entire groups to one split —
    standard leakage control in dataset curation.

    Scale shape: map-side split assignment (md5 of a short key), one
    aggregation keyed on (source, split) — and split is functionally
    dependent on source, so cardinality equals the domain count."""
    docs = table(spark, sf_dir, "documents")
    hx = F.substring(F.md5(F.col("source")), 1, 1)
    return (
        docs.select(
            "source",
            F.when(hx.between("0", "b"), "train")
            .when(hx.isin("c", "d"), "val")
            .otherwise("test")
            .alias("split"),
            "n_chars",
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


ES_SAMPLE_K = 50
#: Knuth multiplicative constant; (id * C) % P with prime P gives a
#: deterministic, engine-portable pseudo-uniform (no engine hash needed).
ES_HASH_C = 2_654_435_761
ES_HASH_P = 1_000_003


@register(
    "weighted_sample_es",
    oracle=f"""
    SELECT doc_id, n_chars, round(es_key, 8) AS es_key
    FROM (
        SELECT doc_id, n_chars,
               -- pmod the id FIRST (r11 id-domain sweep): ids are opaque
               -- int64s — a raw doc_id * C overflows near 2^62 and a
               -- negative id makes truncated % negative (ln() of a
               -- negative u); (id mod P)*C mod P is the same residue on
               -- every id, bounded under P*C ~ 2.7e15
               ln((CAST((((doc_id % {ES_HASH_P}) + {ES_HASH_P}) % {ES_HASH_P}
                         * {ES_HASH_C}) % {ES_HASH_P} AS DOUBLE) + 0.5)
                  / {ES_HASH_P}) / n_chars AS es_key
        -- zero-weight docs can never be sampled (A-ES key undefined);
        -- the filter also keeps Spark's ANSI division alive on blank
        -- docs (r10 null-shape random sweep)
        FROM documents WHERE n_chars > 0
    )
    ORDER BY es_key DESC, doc_id
    LIMIT {ES_SAMPLE_K}
    """,
    doc=f"Weighted sampling without replacement (Efraimidis-Spirakis "
    f"A-ES): top-{ES_SAMPLE_K} docs by ln(u)/weight with a deterministic "
    "arithmetic-hash uniform; weight = n_chars.",
)
def weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling without replacement — the standard
    one-pass algorithm (Efraimidis & Spirakis 2006): each row draws
    u ~ U(0,1) and keeps key u^(1/w); the global top-k keys ARE a weighted
    sample.  Ranking by ln(u)/w is order-equivalent and better
    conditioned.  The uniform comes from portable integer arithmetic
    ((id*C) mod P), so the oracle reproduces it exactly — a real
    deployment swaps in xxhash64 with a seed.

    Scale shape: map-only key computation + global top-k, which compiles
    to TakeOrderedAndProject (per-partition heaps, only k rows reach the
    driver) — one pass, no shuffle of the corpus, exactly how you sample
    a 100 TB corpus by token weight."""
    docs = table(spark, sf_dir, "documents")
    # pmod-first id reduction: same residue on every id, overflow- and
    # sign-safe (see oracle note; r11 id-domain sweep)
    u = (
        ((F.pmod(F.col("doc_id"), F.lit(ES_HASH_P)) * F.lit(ES_HASH_C))
         % F.lit(ES_HASH_P)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(ES_HASH_P))
    key = F.log(u) / F.col("n_chars")
    return (
        # zero-weight docs are unsampleable by definition (see oracle)
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), F.asc("doc_id"))
        .limit(ES_SAMPLE_K)
        .select("doc_id", "n_chars", F.round("k", 8).alias("es_key"))
    )


#: Target mixture weights by language (sum to 1); unlisted -> 0.02 floor.
MIX_TARGET_WEIGHTS = {"en": 0.55, "de": 0.15, "es": 0.12, "fr": 0.12}
MIX_DEFAULT_WEIGHT = 0.02
MIX_TOKEN_BUDGET = 1_000_000


def _mix_weight_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_TARGET_WEIGHTS.items()
    )
    return f"CASE {cases} ELSE {MIX_DEFAULT_WEIGHT} END"


@register(
    "mixture_budget_allocator",
    oracle=f"""
    WITH avail AS (
        SELECT lang,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                   AS avail_tokens
        FROM documents GROUP BY lang
    )
    SELECT lang, avail_tokens,
           CAST(round({MIX_TOKEN_BUDGET} * ({_mix_weight_sql()}), 0)
                AS BIGINT) AS target_tokens,
           round(least(
               CAST({MIX_TOKEN_BUDGET} * ({_mix_weight_sql()}) AS DOUBLE)
                   / avail_tokens, 1.0), 6) AS sample_rate,
           round(greatest(
               CAST({MIX_TOKEN_BUDGET} * ({_mix_weight_sql()}) AS DOUBLE)
                   / avail_tokens, 1.0), 6) AS epochs_needed
    FROM avail
    """,
    doc=f"Mixture planning: per-language token budgets from target "
    f"weights over a {MIX_TOKEN_BUDGET}-token training budget, with the "
    "sampling rate (when over-supplied) or epoch count (when under-"
    "supplied) each language needs.",
)
def mixture_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning step ahead of ``mixture_sampling_weighted``: turn
    target mixture weights + the measured token supply into per-source
    sampling rates (supply > budget share) or epoch multipliers
    (supply < budget share — the up-sampling regime public data-mixture
    work reasons about).

    Scale shape: one aggregation to language grain, then pure scalar
    arithmetic on the rollup — the corpus is scanned once for token
    counts."""
    docs = table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("avail_tokens")
    )
    expr = None
    for k, v in MIX_TARGET_WEIGHTS.items():
        expr = (
            F.when(F.col("lang") == k, v)
            if expr is None
            else expr.when(F.col("lang") == k, v)
        )
    weight = expr.otherwise(MIX_DEFAULT_WEIGHT)
    target = F.lit(MIX_TOKEN_BUDGET) * weight
    ratio = target.cast("double") / F.col("avail_tokens")
    return avail.select(
        "lang",
        "avail_tokens",
        F.round(target, 0).cast("long").alias("target_tokens"),
        F.round(F.least(ratio, F.lit(1.0)), 6).alias("sample_rate"),
        F.round(F.greatest(ratio, F.lit(1.0)), 6).alias("epochs_needed"),
    )


@register(
    "dataset_card_summary",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS INT) AS n_langs,
           CAST(count(DISTINCT source) AS INT) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
               AS n_exact_dups,
           round(avg(CAST(n_chars AS DOUBLE)), 2) AS avg_chars,
           CAST(min(n_chars) AS INT) AS min_chars,
           CAST(max(n_chars) AS INT) AS max_chars
    FROM documents
    """,
    doc="Dataset card: the one-row corpus summary (docs, langs, sources, "
    "chars, tokens, exact-dup count, length stats) every published "
    "dataset ships.",
)
def dataset_card_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-a-glance numbers a dataset card publishes (public norm:
    HF dataset cards / Datasheets for Datasets) — all from ONE scan: the
    multi-distinct aggregate plans a single Expand, and every other
    stat shares it.

    avg is count+sum derived (both exact integers divided once), so the
    double is engine-identical."""
    docs = table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").cast("int").alias("n_langs"),
        F.countDistinct("source").cast("int").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
        (F.count("*") - F.countDistinct(F.md5("text")))
        .cast("long")
        .alias("n_exact_dups"),
        # divide by COUNT(n_chars), not COUNT(*): avg() skips NULLs on
        # both engines, so the mean is over docs WITH a length
        # (r12 NULL-heavy sweep)
        F.round(
            F.sum("n_chars").cast("double") / F.count("n_chars"), 2
        ).alias("avg_chars"),
        F.min("n_chars").cast("int").alias("min_chars"),
        F.max("n_chars").cast("int").alias("max_chars"),
    )


@register(
    "sequence_packing_bfd",
    # Promoted rows-only -> oracle in r6 (r5 VERDICT ask #2d, via the
    # kcore/LPA round-replay technique rather than the weaker invariant
    # projection): BFD is sequential per source but DETERMINISTIC —
    # (n_tokens DESC, doc_id) order, best-fit = min headroom then min
    # bin_id, bins indexed by creation order — so a DuckDB recursive CTE
    # replays it doc-by-doc.  Working-table rows are per-source bins
    # (bin_id, headroom, n_docs, tok) plus a rank cursor r; iteration r
    # places the doc ranked r in every source at once: the chosen bin is
    # the argmin join (min headroom among fitting bins, tie -> min
    # bin_id, same inlined-subquery shape as the LPA oracle), a fresh bin
    # appears when the HAVING detects zero fitting bins, and a sentinel
    # bin_id=-1 row per source carries sources between docs.  All-integer
    # state, bit-exact replay of the applyInPandas BFD.
    oracle=rf"""
    WITH RECURSIVE t AS (
        -- packable docs only (r12 NULL-heavy sweep): a NULL text has no
        -- token count, and NULL n sorts engine-opposite in the rank
        SELECT doc_id, source,
               CAST(len({SQL_SPLIT_TEXT}) AS BIGINT) AS n
        FROM documents WHERE text IS NOT NULL
    ),
    ranked AS (
        SELECT source, doc_id, n,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n DESC, doc_id) AS rank
        FROM t
    ),
    bins(r, source, bin_id, headroom, n_docs, tok) AS (
      SELECT 1, source, -1, CAST(-1 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT source FROM ranked)
      UNION ALL
      SELECT * FROM (
        SELECT b.r + 1 AS r, b.source, b.bin_id,
               CASE WHEN ch.bin_id = b.bin_id
                    THEN b.headroom - d.n ELSE b.headroom END AS headroom,
               CASE WHEN ch.bin_id = b.bin_id
                    THEN b.n_docs + 1 ELSE b.n_docs END AS n_docs,
               CASE WHEN ch.bin_id = b.bin_id
                    THEN b.tok + d.n ELSE b.tok END AS tok
        FROM bins b
        LEFT JOIN ranked d ON d.source = b.source AND d.rank = b.r
        LEFT JOIN (
            SELECT f.source, MIN(f.bin_id) AS bin_id
            FROM (
              SELECT b2.source, b2.bin_id, b2.headroom
              FROM bins b2
              JOIN ranked d2 ON d2.source = b2.source AND d2.rank = b2.r
              WHERE b2.bin_id >= 0 AND b2.headroom >= d2.n
            ) f
            JOIN (
              SELECT b3.source, MIN(b3.headroom) AS mh
              FROM bins b3
              JOIN ranked d3 ON d3.source = b3.source AND d3.rank = b3.r
              WHERE b3.bin_id >= 0 AND b3.headroom >= d3.n
              GROUP BY b3.source
            ) m ON m.source = f.source AND f.headroom = m.mh
            GROUP BY f.source
        ) ch ON ch.source = b.source
        WHERE b.r <= (SELECT MAX(rank) FROM ranked)
        UNION ALL
        SELECT b.r + 1, b.source, MAX(b.bin_id) + 1,
               {PACK_BUDGET_TOKENS} - MAX(d.n), CAST(1 AS BIGINT), MAX(d.n)
        FROM bins b
        JOIN ranked d ON d.source = b.source AND d.rank = b.r
        WHERE b.r <= (SELECT MAX(rank) FROM ranked)
        GROUP BY b.r, b.source
        HAVING COUNT(CASE WHEN b.bin_id >= 0 AND b.headroom >= d.n
                          THEN 1 END) = 0
      ) nxt
    )
    SELECT source, CAST(bin_id AS BIGINT) AS pack_id, n_docs,
           tok AS n_tokens_total
    FROM bins
    WHERE r = (SELECT MAX(rank) + 1 FROM ranked) AND bin_id >= 0
    """,
    doc=f"Best-fit-decreasing sequence packing (budget {PACK_BUDGET_TOKENS} tokens): per-source bins via applyInPandas; hard budget honored (oversized docs get singleton bins).",
)
def sequence_packing_bfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bin-packing upgrade of ``sequence_packing_greedy``: greedy
    cumulative fill lets a document straddle its budget boundary, BFD
    sorts docs longest-first and places each into the fullest bin that
    still fits — classic 11/9·OPT+1 guarantee, hard budget respected
    (docs longer than the budget get singleton bins).  Packing is
    inherently sequential WITHIN a source, so each source's doc list runs
    through one ``applyInPandas`` group — parallelism across sources
    (at 100 TB: thousands of sources / source-shards, each group's state
    is its bin headroom list, O(bins) memory).  Deterministic: sort by
    (n_tokens desc, doc_id), bins indexed by creation order, headroom
    ties resolved to the lowest bin id."""
    import pandas as pd

    # packable docs only — see the oracle note (r12 NULL-heavy sweep)
    docs = (
        table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", WS_RE)).alias("n_tokens"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        headroom: list[int] = []  # headroom per bin, index = bin id
        assign = []
        for n in pdf["n_tokens"]:
            best, best_room = -1, None
            for b, room in enumerate(headroom):
                if room >= n and (best_room is None or room < best_room):
                    best, best_room = b, room
            if best < 0:
                headroom.append(PACK_BUDGET_TOKENS - n)
                assign.append(len(headroom) - 1)
            else:
                headroom[best] -= n
                assign.append(best)
        out = pdf.assign(pack_id=assign)
        return out.groupby(["source", "pack_id"], as_index=False).agg(
            n_docs=("doc_id", "size"), n_tokens_total=("n_tokens", "sum")
        )

    return (
        docs.groupBy("source")
        .applyInPandas(
            pack, "source string, pack_id long, n_docs long, n_tokens_total long"
        )
    )


#: Contrastive-pair mining: anchors are a ~1% doc sample, negatives come
#: from an independent ~1% shared pool ("in-batch negatives").  Both mods
#: are coprime so the two samples don't alias.
NEG_ANCHOR_MOD = 97
NEG_POOL_MOD = 101
NEG_POOL_RESIDUE = 7
NEG_PER_ANCHOR = 3


@register(
    "negative_sampling_inbatch",
    oracle=f"""
    WITH anchors AS (
        SELECT doc_id AS anchor_id, lang AS anchor_lang
        FROM documents WHERE doc_id % {NEG_ANCHOR_MOD} = 0
    ),
    pool AS (
        SELECT doc_id AS neg_id, lang AS neg_lang
        FROM documents WHERE doc_id % {NEG_POOL_MOD} = {NEG_POOL_RESIDUE}
    ),
    ranked AS (
        SELECT anchor_id, neg_id, neg_lang,
               ROW_NUMBER() OVER (
                   PARTITION BY anchor_id
                   ORDER BY md5(CAST(anchor_id AS VARCHAR) || ':'
                                || CAST(neg_id AS VARCHAR)), neg_id
               ) AS neg_rank
        FROM anchors CROSS JOIN pool
        WHERE neg_id <> anchor_id AND neg_lang <> anchor_lang
    )
    SELECT anchor_id, neg_rank, neg_id, neg_lang
    FROM ranked WHERE neg_rank <= {NEG_PER_ANCHOR}
    """,
    doc=f"Deterministic in-batch negative mining: {NEG_PER_ANCHOR} "
    "cross-language negatives per anchor, ranked by a pair-hash draw "
    "from a broadcast shared pool.",
)
def negative_sampling_inbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training pair mining: each anchor document draws K
    negatives from a SHARED candidate pool (the "in-batch negatives"
    trick — one pool serves every anchor, so the candidate set is tiny
    and broadcastable instead of per-anchor-sampled).  The draw ranks
    pool members by md5(anchor:candidate) — a per-pair pseudo-random
    deterministic across engines and reruns — and keeps cross-language
    candidates only (a cheap hard-negative filter).

    Scale shape: the pool is a ~1% mod-sample, broadcast once; anchors
    stream map-side through the broadcast product, and the only shuffle
    is the per-anchor top-K window at anchors x |pool| rows.  At 100 TB
    you'd cap the pool with an explicit LIMIT-guard (same pattern as
    knn's query cap); the mod-sample keeps this tier bounded here.
    """
    from azure_func_forem_data_etl_spark.operators._guards import assert_bounded_input

    docs = table(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % NEG_ANCHOR_MOD == 0).select(
        F.col("doc_id").alias("anchor_id"), F.col("lang").alias("anchor_lang")
    )
    pool = docs.filter(F.col("doc_id") % NEG_POOL_MOD == NEG_POOL_RESIDUE).select(
        F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
    )
    # The broadcast pool must stay broadcast-sized: the anchors x pool
    # product grows quadratically with corpus size under fixed mods, so
    # refuse loudly past the bound (same discipline as the all-pairs
    # ground-truth tiers) — the 100 TB fix is LIMITing the pool draw.
    assert_bounded_input(pool.select("neg_id"), "negative_sampling_inbatch pool")
    pairs = (
        anchors.crossJoin(F.broadcast(pool))
        .filter(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("neg_lang") != F.col("anchor_lang"))
        )
        .withColumn(
            "neg_rank",
            F.row_number().over(
                Window.partitionBy("anchor_id").orderBy(
                    F.md5(
                        F.concat(
                            F.col("anchor_id").cast("string"),
                            F.lit(":"),
                            F.col("neg_id").cast("string"),
                        )
                    ),
                    "neg_id",
                )
            ),
        )
    )
    return pairs.filter(F.col("neg_rank") <= NEG_PER_ANCHOR).select(
        "anchor_id", "neg_rank", "neg_id", "neg_lang"
    )


BATCH_SIZE = 16  # examples per training batch


@register(
    "length_grouped_batches",
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    sorted_b AS (
        SELECT n_chars,
               CAST(floor((ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1)
                    / {BATCH_SIZE}) AS BIGINT) AS batch_id
        FROM documents_canon
    ),
    shuffled_b AS (
        SELECT n_chars,
               CAST(floor((ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
                    / {BATCH_SIZE}) AS BIGINT) AS batch_id
        FROM documents_canon
    ),
    w AS (
        -- padding_frac CASE-guarded: an all-blank corpus has zero batch
        -- capacity SUM(mx*n) and the fraction is undefined (r11 blank-
        -- docs sweep); such strategy rows are dropped below
        SELECT 'length_grouped' AS strategy,
               CAST(COUNT(*) AS BIGINT) AS n_batches,
               CAST(SUM(mx * n - tot) AS BIGINT) AS padding_chars,
               CASE WHEN SUM(mx * n) > 0 THEN
                   round(SUM(mx * n - tot) / CAST(SUM(mx * n) AS DOUBLE), 6)
               END AS padding_frac
        FROM (SELECT batch_id, MAX(n_chars) AS mx, COUNT(*) AS n,
                     SUM(n_chars) AS tot
              FROM sorted_b GROUP BY batch_id)
        UNION ALL
        SELECT 'shuffled',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(mx * n - tot) AS BIGINT),
               CASE WHEN SUM(mx * n) > 0 THEN
                   round(SUM(mx * n - tot) / CAST(SUM(mx * n) AS DOUBLE), 6)
               END AS padding_frac
        FROM (SELECT batch_id, MAX(n_chars) AS mx, COUNT(*) AS n,
                     SUM(n_chars) AS tot
              FROM shuffled_b GROUP BY batch_id)
    )
    SELECT * FROM w WHERE padding_frac IS NOT NULL
    """,
    doc=f"Length-grouped batching audit: padding waste of length-sorted vs "
    f"hash-shuffled batches of {BATCH_SIZE} (the dynamic-batching win, "
    "quantified).",
)
def length_grouped_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why trainers length-group: a batch pads every example to its
    longest member, so random batches waste compute proportional to
    length variance.  This op assigns docs to batches two ways —
    length-sorted (the length-grouped sampler) and hash-shuffled (the
    iid baseline) — and reports padding waste for each; the gap is the
    measured speedup fraction dynamic batching buys on this corpus.

    Scale note: the global row_number over all docs is the honest
    formulation of a GLOBAL length-sorted batch order; at 100 TB the
    sampler length-groups within partitions/pools (same numbers to
    within the pool-boundary batches) so no total order is needed —
    the audit itself only ever aggregates to batch grain.
    """
    docs = entity_table(spark, sf_dir, "documents")

    def waste(order_cols: list, label: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        b = docs.select(
            "n_chars",
            F.floor((F.row_number().over(w) - 1) / BATCH_SIZE).alias("batch_id"),
        )
        per = b.groupBy("batch_id").agg(
            F.max("n_chars").alias("mx"),
            F.count("*").alias("n"),
            F.sum("n_chars").alias("tot"),
        )
        pad = F.sum(F.col("mx") * F.col("n") - F.col("tot"))
        cap = F.sum(F.col("mx") * F.col("n"))
        # CASE-guarded (see oracle): an all-blank corpus has zero batch
        # capacity and no padding fraction; the row drops after the union
        return per.agg(
            F.lit(label).alias("strategy"),
            F.count("*").alias("n_batches"),
            pad.cast("long").alias("padding_chars"),
            F.when(cap > 0, F.round(pad / cap.cast("double"), 6)).alias(
                "padding_frac"
            ),
        )

    sorted_w = waste([F.col("n_chars").desc(), F.col("doc_id")], "length_grouped")
    shuffled = waste([F.md5(F.col("doc_id").cast("string")), F.col("doc_id")], "shuffled")
    return sorted_w.unionByName(shuffled).filter(
        F.col("padding_frac").isNotNull()
    )


TOPP_MASS = 0.5  # nucleus: smallest doc set covering this quality share


@register(
    "nucleus_topp_docs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               CAST(n_chars AS DECIMAL(18,4)) AS q
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, q,
               SUM(q) OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS cum_q,
               SUM(q) OVER (PARTITION BY lang) AS tot_q
        FROM scored
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs_in_nucleus,
           CAST(MIN(q) AS DOUBLE) AS min_q_in_nucleus,
           round(CAST(MAX(cum_q) AS DOUBLE) / CAST(MAX(tot_q) AS DOUBLE), 6)
               AS mass_covered
    FROM ranked
    WHERE cum_q - q < {TOPP_MASS} * tot_q
    GROUP BY lang
    """,
    doc=f"Per-language nucleus (top-p) selection: the smallest top-scored "
    f"doc set covering {TOPP_MASS:.0%} of total quality mass, with its "
    "cut-off score.",
)
def nucleus_topp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p selection — the data-curation analogue of nucleus sampling:
    instead of a fixed top-k or a fixed score threshold, keep the
    smallest high-score prefix whose cumulative mass reaches p.  Robust
    to per-group score-scale differences, which is why mixture builders
    prefer it to a global threshold when budgeting per-source keeps.

    The membership rule is the standard nucleus convention: a doc is in
    if the mass STRICTLY BEFORE it is < p·total (so the boundary doc
    that crosses p is included).  Decimal-domain cumulative sums keep
    the boundary decision bit-identical across engines and partition
    orders.

    Scale shape: one window pass per group (cumsum + total share the
    (lang, q DESC) sort), then a per-group aggregate; quality here is
    n_chars as a stand-in — swap any scorer in, the plan is unchanged.
    """
    docs = table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", F.col("n_chars").cast("decimal(18,4)").alias("q")
    )
    wcum = Window.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    wall = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "q",
        F.sum("q").over(wcum).alias("cum_q"),
        F.sum("q").over(wall).alias("tot_q"),
    )
    nucleus = ranked.filter(
        (F.col("cum_q") - F.col("q")) < F.lit(TOPP_MASS) * F.col("tot_q")
    )
    return nucleus.groupBy("lang").agg(
        F.count("*").alias("n_docs_in_nucleus"),
        F.min("q").cast("double").alias("min_q_in_nucleus"),
        F.round(
            F.max("cum_q").cast("double") / F.max("tot_q").cast("double"), 6
        ).alias("mass_covered"),
    )


@register(
    "cross_source_contamination",
    oracle="""
    WITH fp AS (SELECT DISTINCT source, md5(text) AS f FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_texts
    FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc="Cross-source exact-content overlap matrix: distinct md5 "
    "fingerprints shared between source pairs (who copies from whom).",
)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources carry the same documents?  Cross-source duplication
    skews mixture weights (a doc 'sampled once per source' trains k
    times) and flags scraper overlap — a standard audit before setting
    source quotas (cf. the duplication analyses in C4/Dolma dataset
    reports).

    Scale shape: per-(source, fingerprint) dedup first (32-byte keys,
    bodies never shuffle), then a self-equi-join ON fingerprint —
    bounded by copies-per-text, never corpus-quadratic — into a
    |sources|² cell table.
    """
    docs = table(spark, sf_dir, "documents")
    fp = docs.select("source", F.md5("text").alias("f")).distinct()
    a = fp.select(F.col("source").alias("source_a"), "f")
    b = fp.select(F.col("source").alias("source_b"), "f")
    return (
        a.join(b, "f")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_texts"))
    )


# --- span corruption & mixture concentration (round 7) ---------------------

#: T5-style span corruption: fixed span length, and a span (block) is
#: masked when the first md5 nibble of "doc_id:block" falls in the masked
#: set — 3/16 of blocks ~ 19% of tokens, reproducible in any engine.
SPAN_LEN = 3
SPAN_MASK_NIBBLES = ("0", "1", "2")
_SPAN_NIB_SQL = ", ".join(f"'{n}'" for n in SPAN_MASK_NIBBLES)


@register(
    "span_corruption_stats",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id,
               CAST(len({SQL_SPLIT_FOLDED}) AS BIGINT)
                   AS n_tok
        FROM documents
    ),
    blocks AS (
        SELECT doc_id, n_tok, UNNEST(range((n_tok + {SPAN_LEN} - 1) // {SPAN_LEN}))
                   AS b
        FROM d
    ),
    marked AS (
        SELECT doc_id, n_tok,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(b AS VARCHAR)), 1, 1)
                         IN ({_SPAN_NIB_SQL})
                    THEN LEAST({SPAN_LEN}, n_tok - b * {SPAN_LEN})
                    ELSE 0 END AS masked_in_block,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(b AS VARCHAR)), 1, 1)
                         IN ({_SPAN_NIB_SQL}) THEN 1 ELSE 0 END AS is_span
        FROM blocks
    ),
    per_doc AS (
        SELECT doc_id, MAX(n_tok) AS n_tok,
               CAST(SUM(masked_in_block) AS BIGINT) AS n_masked,
               CAST(SUM(is_span) AS BIGINT) AS n_spans
        FROM marked GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_masked) AS BIGINT) AS total_masked,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           round(CAST(SUM(n_masked) AS BIGINT)
                 / CAST(CAST(SUM(n_tok) AS BIGINT) AS DOUBLE), 6) AS mask_frac,
           round(CAST(SUM(CAST(round(n_masked / CAST(n_tok AS DOUBLE), 6)
                               AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_doc_mask_frac
    FROM per_doc
    """,
    doc=f"T5-style span-corruption plan audit: deterministic md5 block "
    f"masking (span length {SPAN_LEN}, ~{len(SPAN_MASK_NIBBLES)}/16 of "
    "blocks), corpus mask-fraction and span counts.",
)
def span_corruption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective preprocessing audit: before materializing a
    span-corrupted training set, verify the masking plan hits the target
    corruption rate.  Masking depends only on (doc_id, block index) — an
    md5-nibble Bernoulli like deterministic_sample — so the whole audit
    needs just each doc's TOKEN COUNT: blocks are synthesized with
    ``sequence`` (no token explode, no text shuffled), masked block
    token-counts are closed-form, and the rollup is one aggregation.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(F.split(ascii_fold("text"), WS_RE)).cast("long").alias("n_tok")
    )
    nblocks = F.floor((F.col("n_tok") + SPAN_LEN - 1) / SPAN_LEN).cast("long")
    blocks = d.select(
        "doc_id",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("long"), nblocks - 1)).alias("b"),
    )
    nib = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("b").cast("string"))),
        1,
        1,
    )
    is_span = nib.isin(*SPAN_MASK_NIBBLES)
    marked = blocks.select(
        "doc_id",
        "n_tok",
        F.when(
            is_span, F.least(F.lit(SPAN_LEN).cast("long"), F.col("n_tok") - F.col("b") * SPAN_LEN)
        )
        .otherwise(F.lit(0))
        .alias("masked_in_block"),
        F.when(is_span, 1).otherwise(0).alias("is_span"),
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.max("n_tok").alias("n_tok"),
        F.sum("masked_in_block").alias("n_masked"),
        F.sum("is_span").alias("n_spans"),
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("n_masked").alias("total_masked"),
        F.sum("n_spans").alias("total_spans"),
        F.round(
            F.sum("n_masked") / F.sum("n_tok").cast("double"), 6
        ).alias("mask_frac"),
        F.round(
            F.sum(
                F.round(F.col("n_masked") / F.col("n_tok").cast("double"), 6).cast(
                    "decimal(18,6)"
                )
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_doc_mask_frac"),
    )


@register(
    "source_concentration_hhi",
    oracle="""
    WITH s AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_s
        FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(chars_s) AS BIGINT) AS c, COUNT(*) AS k FROM s),
    contrib AS (
        SELECT s.source, s.chars_s, t.c, t.k,
               CAST(round((s.chars_s / CAST(t.c AS DOUBLE))
                          * (s.chars_s / CAST(t.c AS DOUBLE)) * 10000, 8)
                    AS DECIMAL(18,8)) AS hhi_i
        FROM s, t
        -- degenerate contract (r11 blank-docs sweep): zero total
        -- character mass => shares undefined — no rows on BOTH engines
        WHERE t.c > 0
    )
    SELECT CAST(MAX(k) AS BIGINT) AS n_sources,
           round(CAST(SUM(hhi_i) AS DOUBLE), 4) AS hhi,
           round(MAX(chars_s) / CAST(MAX(c) AS DOUBLE), 6) AS top_share,
           round(10000.0 / CAST(SUM(hhi_i) AS DOUBLE), 4) AS effective_n
    FROM contrib
    HAVING COUNT(*) > 0
    """,
    doc="Herfindahl-Hirschman concentration of the corpus across sources "
    "(by character mass, 0-10000 scale) with effective source count.",
)
def source_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-health metric: a training mix dominated by one source
    (HHI -> 10000) overfits its domain; effective_n = 10000/HHI is the
    "equivalent number of equal sources".  One aggregation to the
    source-grain table, then scalar math over ~20 rows with 8dp-quantized
    decimal summation of the share-squared contributions.
    """
    docs = table(spark, sf_dir, "documents")
    s = (
        docs.groupBy("source")
        .agg(F.sum("n_chars").alias("chars_s"))
        .localCheckpoint(eager=True)  # ~20 rows, shared by t and contrib
    )
    t = s.agg(F.sum("chars_s").alias("c"), F.count("*").alias("k"))
    share = F.col("chars_s") / F.col("c").cast("double")
    # degenerate contract (see oracle): zero character mass => no rows;
    # the filter precedes the share projection so ANSI never divides
    contrib = s.crossJoin(F.broadcast(t)).filter(F.col("c") > 0).select(
        "chars_s",
        "c",
        "k",
        F.round(share * share * 10000, 8).cast("decimal(18,8)").alias("hhi_i"),
    )
    return contrib.agg(
        F.max("k").cast("long").alias("n_sources"),
        F.round(F.sum("hhi_i").cast("double"), 4).alias("hhi"),
        F.round(F.max("chars_s") / F.max("c").cast("double"), 6).alias("top_share"),
        F.round(10000.0 / F.sum("hhi_i").cast("double"), 4).alias("effective_n"),
    ).filter(F.col("n_sources").isNotNull())


@register(
    "mixture_temperature_weights",
    defer=True,
    oracle="""
    WITH s AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
        FROM documents GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS tot FROM s),
    raw AS (
        -- alpha = 0.5 applied as sqrt: correctly-rounded in IEEE, so the
        -- scaled share is a deterministic double in any engine; 10dp
        -- quantization makes the normalization sum exact decimal.
        -- t.tot > 0: zero total mass => shares undefined, no rows
        -- (r11 blank-docs sweep)
        SELECT s.source, s.c, t.tot,
               CAST(round(sqrt(s.c / CAST(t.tot AS DOUBLE)), 10)
                    AS DECIMAL(18,10)) AS w_raw
        FROM s, t
        WHERE t.tot > 0
    ),
    z AS (SELECT SUM(w_raw) AS zsum FROM raw)
    SELECT r.source,
           round(r.c / CAST(r.tot AS DOUBLE), 6) AS p_raw,
           round(CAST(r.w_raw AS DOUBLE) / CAST(z.zsum AS DOUBLE), 6)
               AS p_temp,
           round((CAST(r.w_raw AS DOUBLE) / CAST(z.zsum AS DOUBLE))
                 / (r.c / CAST(r.tot AS DOUBLE)), 6) AS upsample_factor
    FROM raw r, z
    """,
    doc="Temperature-scaled mixture weights (alpha=0.5, mT5-style): "
    "per-source raw share, temperature share, and upsample factor.",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard fix for head-heavy training mixes (mT5/XLM-R alpha
    sampling): sampling probability proportional to share^alpha lifts
    the tail sources without letting any source dominate.  alpha = 0.5
    is applied as sqrt — the one power IEEE guarantees correctly
    rounded, so both engines compute identical doubles; scaled weights
    are 10dp-quantized before the exact normalization sum.  One
    source-grain aggregation end-to-end.
    """
    docs = table(spark, sf_dir, "documents")
    s = (
        docs.groupBy("source")
        .agg(F.sum("n_chars").alias("c"))
        .localCheckpoint(eager=True)  # shared by t, raw
    )
    t = s.agg(F.sum("c").alias("tot"))
    # degenerate contract (see oracle): zero total mass => no rows
    raw = s.crossJoin(F.broadcast(t)).filter(F.col("tot") > 0).select(
        "source",
        "c",
        "tot",
        F.round(F.sqrt(F.col("c") / F.col("tot").cast("double")), 10)
        .cast("decimal(18,10)")
        .alias("w_raw"),
    ).localCheckpoint(eager=True)  # shared by z and the final projection
    z = raw.agg(F.sum("w_raw").alias("zsum"))
    p_raw = F.col("c") / F.col("tot").cast("double")
    p_temp = F.col("w_raw").cast("double") / F.col("zsum").cast("double")
    return raw.crossJoin(F.broadcast(z)).select(
        "source",
        F.round(p_raw, 6).alias("p_raw"),
        F.round(p_temp, 6).alias("p_temp"),
        F.round(p_temp / p_raw, 6).alias("upsample_factor"),
    )


KFOLD_K = 5


@register(
    "stratified_kfold_audit",
    defer=True,
    oracle=f"""
    WITH d AS (
        SELECT lang,
           -- md5-nibble fold assignment (first nibble mod k): identical in
           -- any engine, stratification-free by construction
           CAST(CASE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2
                WHEN '3' THEN 3 WHEN '4' THEN 4 WHEN '5' THEN 5
                WHEN '6' THEN 6 WHEN '7' THEN 7 WHEN '8' THEN 8
                WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14
                ELSE 15 END % {KFOLD_K} AS BIGINT) AS fold
        FROM documents
    ),
    cell AS (
        SELECT fold, lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2
    ),
    m AS (
        SELECT fold, lang, n,
               SUM(n) OVER (PARTITION BY lang) AS n_lang,
               SUM(n) OVER () AS n_all,
               SUM(n) OVER (PARTITION BY fold) AS n_fold
        FROM cell
    )
    SELECT fold, lang, n AS n_docs,
           CAST(MAX(n_fold) AS BIGINT) AS fold_size,
           -- representation ratio: lang share in fold vs corpus share
           round((n / CAST(MAX(n_fold) AS DOUBLE))
                 / (MAX(n_lang) / CAST(MAX(n_all) AS DOUBLE)), 6)
               AS rep_ratio
    FROM m GROUP BY fold, lang, n
    """,
    doc=f"{KFOLD_K}-fold assignment audit: per (fold, lang) counts and the "
    "representation ratio of each language inside each md5-assigned fold.",
)
def stratified_kfold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before trusting a k-fold cross-validation split, audit it: a
    hash-based fold assignment is reproducible (unlike rand()) but NOT
    stratified, so minority languages can be badly over/under-represented
    in individual folds — rep_ratio far from 1 flags folds whose metrics
    will be noisy for that slice.  The fold is the first md5 nibble mod
    k, the audit is one bounded (fold x lang) aggregation with window
    marginals.
    """
    docs = table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    fold = (
        F.when(nib == "a", 10)
        .when(nib == "b", 11)
        .when(nib == "c", 12)
        .when(nib == "d", 13)
        .when(nib == "e", 14)
        .when(nib == "f", 15)
        .otherwise(nib.cast("int"))
        % KFOLD_K
    ).cast("long")
    cell = docs.select(fold.alias("fold"), "lang").groupBy("fold", "lang").agg(
        F.count("*").alias("n")
    )
    m = cell.select(
        "fold",
        "lang",
        "n",
        F.sum("n").over(Window.partitionBy("lang")).alias("n_lang"),
        F.sum("n").over(Window.partitionBy()).alias("n_all"),
        F.sum("n").over(Window.partitionBy("fold")).alias("n_fold"),
    )
    return m.groupBy("fold", "lang", "n").agg(
        F.max("n_fold").alias("fold_size"),
        F.round(
            (F.col("n") / F.max("n_fold").cast("double"))
            / (F.max("n_lang") / F.max("n_all").cast("double")),
            6,
        ).alias("rep_ratio"),
    ).withColumnRenamed("n", "n_docs")


# ---------------------------------------------------------------------------
# Bloom false-positive-rate audit (round 8)


def _bloom_fpr_oracle() -> str:
    """DuckDB replay of the bloom FPR audit: the gram split CTEs of
    _DECONTAM_ORACLE_SQL, then every distinct gram's BLOOM_K bit
    positions via the bit-exact xxhash64 replay (string hash seeded 42,
    then hashInt(i) chained on it — exactly F.xxhash64(gram, lit(i))).
    BLOOM_M_BITS is a power of two, so pmod of the signed hash equals the
    unsigned hash's low bits (a plain mask)."""
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    grams_cte = _DECONTAM_ORACLE_SQL.split("bench AS")[0].strip()
    assert grams_cte.startswith("WITH ")
    str_ctes = X.xxh64_str_ctes("gs", "vocab", ["sid"], "g_txt", [(0, 42)])
    int_ctes = X.xxh64_int_col_ctes("gp", "probes", ["sid"], "i", "hs")
    return f"""
    {grams_cte.replace("WITH ", "WITH RECURSIVE ", 1)}
    bench AS MATERIALIZED (SELECT DISTINCT gram FROM grams WHERE split = 'test'),
    probe_grams AS MATERIALIZED (
        SELECT DISTINCT gram FROM grams
        WHERE split = 'train'
          AND gram NOT IN (SELECT gram FROM bench)
    ),
    vocab AS MATERIALIZED (
        SELECT g_txt, row_number() OVER (ORDER BY g_txt) AS sid FROM (
            SELECT gram AS g_txt FROM bench
            UNION SELECT gram FROM probe_grams
        )
    ),
    {str_ctes},
    probes AS (
        SELECT h.sid, h.h AS hs, t.i
        FROM gs_hash h, UNNEST(generate_series(0, {BLOOM_K - 1})) AS t(i)
    ),
    {int_ctes},
    pos AS (
        SELECT v.g_txt AS gram, p.i,
               CAST(p.h & {BLOOM_M_BITS - 1} AS BIGINT) AS pos
        FROM gp_hash p JOIN vocab v ON v.sid = p.sid
    ),
    bits AS (
        SELECT DISTINCT pos.pos FROM pos JOIN bench b ON b.gram = pos.gram
    ),
    hits AS (
        SELECT pos.gram, COUNT(DISTINCT pos.i) AS k_hit
        FROM pos
            JOIN probe_grams pg ON pg.gram = pos.gram
            JOIN bits ON bits.pos = pos.pos
        GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bench) AS n_bench_grams,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM probe_grams) AS n_probe_grams,
           CAST(COUNT(*) AS BIGINT) AS n_false_positives,
           CAST(1000000 * COUNT(*)
                // (SELECT COUNT(*) FROM probe_grams) AS BIGINT) AS fpr_ppm
    FROM hits WHERE k_hit = {BLOOM_K}
    -- degenerate contract (r11 single-row sweep): no probe grams => no
    -- FPR to measure (x // 0 is NULL in DuckDB but the Spark side's
    -- integral ppm cannot represent "undefined") — 0 rows on BOTH engines
    HAVING (SELECT COUNT(*) FROM probe_grams) > 0
    """


@register(
    "bloom_fpr_audit",
    defer=2,
    oracle=_bloom_fpr_oracle(),
    doc=f"Observed false-positive rate of the {BLOOM_M_BITS // 8 // 1024} "
    f"KiB / {BLOOM_K}-probe decontamination bloom filter: non-benchmark "
    "train grams whose every probe bit is set, in ppm.",
)
def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the bloom prefilter actually delivering its designed ~1% FPR on
    THIS corpus?  The audit measures it exactly: build the bit set from
    benchmark grams, probe every true non-member train gram, count the
    ones whose all-{k} probe bits collide.  Everything is integer
    (counts, a parts-per-million integral division) — no float anywhere.

    Scale shape: position generation is map-side hashing; the membership
    check joins probe positions against the BENCHMARK-sized bit set
    (broadcast), so the train corpus never shuffles by position.
    """
    grams = _decontam_grams(spark, sf_dir)
    bench = grams.filter(F.col("split") == "test").select("gram").distinct()
    # consumed by count + position probe, both driver-driven below — so
    # checkpoint once and RELEASE the blocks before returning (the result
    # is assembled from driver scalars; nothing lazy survives this call)
    probe_grams, release_probe = scoped_checkpoint(
        grams.filter(F.col("split") == "train")
        .select("gram")
        .distinct()
        .join(bench, "gram", "left_anti")
    )
    def positions(df):
        return df.select(
            "gram",
            F.posexplode(F.array(*_bloom_positions(F.col("gram")))).alias(
                "i", "pos"
            ),
        )

    bits = positions(bench).select("pos").distinct()
    hits = (
        positions(probe_grams)
        .join(F.broadcast(bits), "pos")
        .groupBy("gram")
        .agg(F.countDistinct("i").alias("k_hit"))
        .filter(F.col("k_hit") == BLOOM_K)
    )
    n_bench = bench.count()
    n_bits = bits.count()
    n_probe = probe_grams.count()
    n_fp = hits.count()
    release_probe()  # every consumer driven; drop the checkpoint's blocks
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_bench_grams", T.LongType()),
            T.StructField("n_bits_set", T.LongType()),
            T.StructField("n_probe_grams", T.LongType()),
            T.StructField("n_false_positives", T.LongType()),
            T.StructField("fpr_ppm", T.LongType()),
        ]
    )
    if n_probe == 0:
        # degenerate contract (see oracle): nothing to probe, no FPR row
        return spark.createDataFrame([], schema)
    # integral ppm: Python floor div on exact ints, never a double divide
    # (a correctly-rounded quotient can land on the next integer)
    return spark.createDataFrame(
        [(n_bench, n_bits, n_probe, n_fp, 1000000 * n_fp // n_probe)],
        schema,
    )

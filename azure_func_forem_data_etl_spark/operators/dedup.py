"""Deduplication suite over the documents table (north-star LLM pipeline):

- exact: hash-groupBy on a 128-bit fingerprint — the shuffle key is 32
  bytes, never the document body.
- n-gram Jaccard: exact pairwise similarity on a sampled subset
  (oracle-checkable); the all-pairs scale path is MinHash-LSH below.
- MinHash-LSH: shingle -> k minhashes -> banded bucket join -> candidate
  pairs -> exact-Jaccard verification.  Only candidate pairs ever meet,
  so cost is ~linear in corpus size for fixed near-dup density.
- SimHash: 32-bit fingerprints, banded hamming candidate search.

The reference's only dedup is implied-by-id (SURVEY.md §4.3); everything
here is engine surface.  Hash functions are engine-deterministic
(per-permutation seeded xxhash64), so results are stable across
runs/partitionings — required for the driver's rows-only repeatability.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from azure_func_forem_data_etl_spark.operators.ckpt import scoped_checkpoint
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    entity_table,
    scale_out,
    table,
)

# ---------------------------------------------------------------------------
# shared shingle machinery

def word_shingles(df: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document."""
    words = F.split(F.col(text_col), " ")
    grams = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - {n - 1}), "
        f"i -> array_join(slice(split({text_col}, ' '), i, {n}), ' '))"
    )
    return (
        df.filter(F.size(words) >= n)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def _sql_shingles(
    n: int, source_filter: str = "TRUE", source: str = "documents"
) -> str:
    """DuckDB twin of word_shingles (distinct word n-grams)."""
    joins = " || ' ' || ".join(f"words[i + {j}]" for j in range(n))
    return f"""
        SELECT DISTINCT doc_id, {joins} AS shingle
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM {source} WHERE {source_filter}
        ), UNNEST(generate_series(1, len(words) - {n - 1})) AS t(i)
        WHERE len(words) >= {n}
    """


# ---------------------------------------------------------------------------
# hot-bucket-bounded candidate generation (shared by MinHash / SimHash / IVF)

MAX_BUCKET_ALLPAIRS = 64  # all-pairs only below this; oversized buckets -> star


def capped_bucket_pairs(
    ex: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int = MAX_BUCKET_ALLPAIRS,
    payload: tuple[str, ...] = (),
) -> DataFrame:
    """Within-bucket candidate pairs with a hot-bucket bound.

    Buckets with <= ``cap`` members emit all within-bucket pairs (the
    normal LSH candidate self-join).  Oversized buckets — one boilerplate
    cluster would otherwise go quadratic — fall back to a linear *star*:
    every member pairs with the bucket's min-id hub.  Near-dup groups are
    near-cliques, so the star keeps them connected for downstream
    verification/clustering while bounding the candidate count at
    O(cap^2 + bucket_size) per bucket instead of O(bucket_size^2).

    ``payload`` columns (functionally dependent on ``id_col``, e.g. the
    simhash fingerprint) ride along as ``{p}_a``/``{p}_b``.  Output ids
    satisfy ``{id}_a < {id}_b`` and pairs are distinct across buckets.

    Bucket size + hub are window aggregates over the bucket key — ONE
    shuffle, no sizes-join — and the annotated rows are materialized once
    (localCheckpoint) because three consumers (both small-pair join sides
    and the star branch) would otherwise recompute the window 3x.
    Measured ~1.6x faster than the groupBy+join formulation at sf0.1.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*bucket_cols)
    ex2 = (
        ex.withColumn("_bsz", F.count("*").over(w))
        # struct-min orders by id first => hub is the bucket's min id
        .withColumn("_hub", F.min(F.struct(id_col, *payload)).over(w))
    ).localCheckpoint(eager=True)

    def side(df: DataFrame, suffix: str) -> DataFrame:
        cols = [F.col(c) for c in bucket_cols]
        cols.append(F.col(id_col).alias(f"{id_col}_{suffix}"))
        cols.extend(F.col(p).alias(f"{p}_{suffix}") for p in payload)
        return df.select(*cols)

    small = ex2.filter(F.col("_bsz") <= cap)
    a, b = side(small, "a"), side(small, "b")
    cond = a[f"{id_col}_a"] < b[f"{id_col}_b"]
    for c in bucket_cols:
        cond = cond & (a[c] == b[c])
    out_cols = [f"{id_col}_a", f"{id_col}_b"]
    out_cols.extend(f"{p}_{s}" for p in payload for s in ("a", "b"))
    pairs_small = a.join(b, cond).select(*out_cols)

    big = ex2.filter(
        (F.col("_bsz") > cap) & (F.col(id_col) != F.col(f"_hub.{id_col}"))
    )
    star_cols = [F.col(f"_hub.{id_col}").alias(f"{id_col}_a")]
    star_cols.append(F.col(id_col).alias(f"{id_col}_b"))
    for p in payload:
        star_cols.append(F.col(f"_hub.{p}").alias(f"{p}_a"))
        star_cols.append(F.col(p).alias(f"{p}_b"))
    star = big.select(*star_cols)

    return pairs_small.unionByName(star.select(*out_cols)).distinct()


# ---------------------------------------------------------------------------
# exact dedup

@register(
    "dedup_exact_text",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: group by 128-bit content hash; representative = min id.",
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("representative_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard on a sample (the correctness oracle for LSH)

JACCARD_SAMPLE_MOD = 5  # doc_id % 5 == 0 => 20% sample; pairs stay bounded
JACCARD_NGRAM = 2
JACCARD_THRESHOLD = 0.05


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    -- canonical doc grain (r13 dup-entity leg): one row per doc_id
    WITH documents_canon AS {SQL_DOCS_CANON},
    sh AS ({_sql_shingles(JACCARD_NGRAM, f"doc_id % {JACCARD_SAMPLE_MOD} = 0", source="documents_canon")}),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_inter,
           sa.n_sh + sb.n_sh - n_inter AS n_union,
           CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    """,
    doc="Exact bigram-shingle Jaccard on a 20% sample; ground truth for the LSH path.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from azure_func_forem_data_etl_spark.operators._guards import assert_bounded_input

    docs = entity_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % JACCARD_SAMPLE_MOD == 0
    )
    # The shingle self-join over this sample grows quadratically with the
    # per-shingle doc count; this tier is ground truth for MinHash-LSH and
    # must stay sample-sized — fail loudly rather than go O(n²) silently.
    assert_bounded_input(docs.select("doc_id"), "ngram_jaccard_pairs")
    # consumed by sizes and both self-join sides — pin the (sample-
    # bounded) shingle explode once
    sh = word_shingles(docs, JACCARD_NGRAM).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_union", F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter"))
        .withColumn("jaccard", F.col("n_inter").cast("double") / F.col("n_union"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return out.select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)

MINHASH_K = 32          # permutations
MINHASH_BANDS = 8       # bands of r = 4 rows: P(candidate | J=0.8) ≈ 0.97
MINHASH_NGRAM = 3
MINHASH_VERIFY_THRESHOLD = 0.4

def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): min over shingles of k INDEPENDENT seeded
    xxhash64 draws — ``xxhash64(i, shingle)`` for permutation i.

    Why not the textbook affine family (a*x + b) mod p over one shared
    x = hash(shingle)?  With x < 2^31 and a < 2^30 the product a*x stays
    below 2^61 ≈ p, so the "permutation" wraps AT MOST ONCE — it is a
    monotone rotation of the x-order, and all k draws share the same
    underlying order.  Consequence: whichever shingle holds the minimum
    x wins argmin for most of the k functions simultaneously, the
    signatures are heavily correlated, and a true-Jaccard-0.92 pair can
    show ~9/32 agreement (observed; the estimator's variance blows up
    exactly on the near-dup pairs LSH exists to find).  Seeding the full
    64-bit mixer per permutation restores pairwise-independent orders at
    identical cost (still one JVM expression per permutation).

    Fully deterministic across runs and partitionings.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
        for i in range(MINHASH_K)
    ]
    # n_sh rides along in the same shuffle: verification needs per-doc
    # shingle counts, and folding them here saves a full shingle
    # recompute + second aggregation exchange.
    return sh.groupBy("doc_id").agg(*aggs, F.count("*").alias("n_sh"))


def lsh_candidate_pairs(
    sig: DataFrame, cap: int = MAX_BUCKET_ALLPAIRS
) -> DataFrame:
    """Banded LSH: hash r consecutive minhashes per band, bucket-join.

    Bucket membership is bounded by ``capped_bucket_pairs`` — a single
    boilerplate cluster (every doc sharing a banner paragraph) lands in
    one bucket and would otherwise produce O(n^2) candidates; the cap
    turns that into a linear hub-star while small buckets keep exact
    all-pairs behavior."""
    r = MINHASH_K // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(*[f"mh_{bi * r + j}" for j in range(r)]).alias("band_hash"),
            )
            for bi in range(MINHASH_BANDS)
        ]
    )
    exploded = sig.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )
    pairs = capped_bucket_pairs(exploded, ["band_id", "band_hash"], "doc_id", cap)
    return pairs.select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    ).distinct()


def verify_jaccard(
    pairs: DataFrame, sh: DataFrame, sizes: DataFrame | None = None
) -> DataFrame:
    """Exact Jaccard, computed only for candidate pairs.

    ``sizes`` (doc_id, n_sh) can be supplied by a caller that already
    aggregated per-doc — e.g. minhash_signatures — to avoid re-counting.
    """
    if sizes is None:
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_sh_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_sh_b")), "doc_b")
        .withColumn("n_union", F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_inter"))
        .withColumn("jaccard", F.col("n_inter").cast("double") / F.col("n_union"))
    )
    return out.select("doc_a", "doc_b", "jaccard")


def _minhash_sig_band_ctes(source: str = "documents") -> str:
    """Shared DuckDB replay of the MinHash signature/banding machinery:
    emits CTEs ``sh`` (doc shingles), ``sizes``, ``sig`` (per-doc signed
    MIN signatures under the 32 permutation seeds) and ``bh_hash``
    (doc_id, band_id, h = banded xxhash64 bucket key).  Shared by the
    minhash_lsh / incremental / cluster-components / curation oracles;
    ``source`` is the (doc_id, text) relation to shingle."""
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    r = MINHASH_K // MINHASH_BANDS
    seeds = [(i, X.xxh64_int(i, X.SPARK_HASH_SEED)) for i in range(MINHASH_K)]
    # integer shingle ids: the hash fold's recursive joins run on sid, not
    # a ~26-char string key (measured ~20% faster at 520k hash rows)
    str_ctes = X.xxh64_str_ctes("mh", "shd", ["sid"], "s_txt", seeds)
    lane_cols = ", ".join(
        f"MAX(CASE WHEN seed_id % {r} = {j} THEN mh END) AS m{j}" for j in range(r)
    )
    band_ctes = X.xxh64_longs_expr_ctes(
        "bh", "bandin", ["doc_id", "band_id"],
        [f"m{j}" for j in range(r)], X.SPARK_HASH_SEED,
    )
    return f"""
    sh AS ({_sql_shingles(MINHASH_NGRAM, source=source)}),
    shd AS (
        SELECT shingle AS s_txt, row_number() OVER (ORDER BY shingle) AS sid
        FROM (SELECT DISTINCT shingle FROM sh)
    ),
    {str_ctes},
    sig AS (
        SELECT sh.doc_id, h.seed_id, MIN({X.signed64('h.h')}) AS mh
        FROM sh
            JOIN shd d ON d.s_txt = sh.shingle
            JOIN mh_hash h ON h.sid = d.sid
        GROUP BY 1, 2
    ),
    bandin AS (
        SELECT doc_id, seed_id // {r} AS band_id, {lane_cols}
        FROM sig GROUP BY 1, 2
    ),
    {band_ctes},
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1)"""


#: Verified-pair tail shared by the minhash_lsh / cluster-components
#: oracles: capped buckets -> candidates -> exact Jaccard >= threshold.
_MINHASH_PAIRS_CTES = f"""
    ann AS (
        SELECT doc_id, band_id, h AS band_hash,
               COUNT(*) OVER (PARTITION BY band_id, h) AS bsz,
               MIN(doc_id) OVER (PARTITION BY band_id, h) AS hub
        FROM bh_hash
    ),
    cand AS (
        SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM ann a JOIN ann b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
            WHERE a.bsz <= {MAX_BUCKET_ALLPAIRS}
            UNION ALL
            SELECT hub, doc_id FROM ann
            WHERE bsz > {MAX_BUCKET_ALLPAIRS} AND doc_id <> hub
        )
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    ),
    verified AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter)
                   AS jaccard
        FROM inter i
            JOIN sizes za ON za.doc_id = i.doc_a
            JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter)
              >= {MINHASH_VERIFY_THRESHOLD}
    )"""


def _minhash_oracle() -> str:
    """Full-pipeline DuckDB replay of minhash_lsh_pairs: 32 seeded
    xxhash64(shingle) draws (seed_i = hashInt(i, 42), precomputed by the
    bit-exact Python reference), per-doc signed MIN signatures, banded
    xxhash64(mh0..mh3) bucket keys via chained hashLong, the hub-star
    bucket cap, and the exact-Jaccard verification join."""
    return f"""
    WITH RECURSIVE
    documents_canon AS {SQL_DOCS_CANON},
    {_minhash_sig_band_ctes(source="documents_canon")},
    {_MINHASH_PAIRS_CTES}
    SELECT doc_a, doc_b, jaccard FROM verified
    """


@register(
    "minhash_lsh_neardup",
    oracle=_minhash_oracle(),
    doc="MinHash-LSH near-dup: shingle -> 32 minhashes -> 8 banded buckets -> verified pairs.",
)
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical doc grain (r13 dup-entity leg; oracle mirrors)
    docs = entity_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs)


def minhash_lsh_pairs(docs: DataFrame, threshold: float = MINHASH_VERIFY_THRESHOLD) -> DataFrame:
    """Reusable pipeline so tests can run it on planted-duplicate corpora."""
    sh = word_shingles(scale_out(docs, "doc_id"), MINHASH_NGRAM)
    # Materialize the shingle set once: three consumers (signatures, both
    # sides of the verification join) would otherwise re-shingle the corpus
    # 3x.  localCheckpoint = executor-local MEMORY_AND_DISK blocks, cleaned
    # up by the ContextCleaner when the plan is GC'd; the 100 TB version of
    # this line is an explicit parquet materialization of the shingle table.
    sh = sh.localCheckpoint(eager=True)
    # One short row per doc, consumed by TWO branches (banding and the
    # verification sizes): materialize it or the signature aggregation
    # runs twice over the shingle table.
    sig = minhash_signatures(sh).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sig)
    sizes = sig.select("doc_id", "n_sh")
    return verify_jaccard(cand, sh, sizes).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash

SIMHASH_BITS = 32
SIMHASH_BAND_BITS = 8
SIMHASH_MAX_HAMMING = 3


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): sign-aggregated 32-bit fingerprint over word
    hashes.  Bit i of xxhash64(word) votes +1/-1; majority sets the bit."""
    # hash hoisted to a projected column so the 32 vote aggregates share
    # ONE xxhash64 evaluation per word by construction (r13; previously
    # each aggregate's input expression re-derived it and codegen
    # subexpression elimination was doing the de-dup implicitly)
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("word")
    ).select("doc_id", F.xxhash64("word").alias("h"))
    h = F.col("h")
    votes = [
        F.sum(F.when(h.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)).alias(f"v_{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    bits = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"v_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return agg.select("doc_id", bits.cast("long").alias("simhash"))


def _simhash_oracle() -> str:
    """Full-pipeline DuckDB replay of simhash_pairs: xxhash64(word) via the
    bit-exact HUGEINT replay (functions/xxh64_sql.py), then the identical
    vote/band/cap/hamming arithmetic.  The hub-star branch mirrors
    capped_bucket_pairs exactly (hub = bucket's min doc_id)."""
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    bits = ", ".join(f"({i}, CAST({1 << i} AS BIGINT))" for i in range(SIMHASH_BITS))
    bands = ", ".join(
        f"({bi}, CAST({1 << (bi * SIMHASH_BAND_BITS)} AS BIGINT))"
        for bi in range(SIMHASH_BITS // SIMHASH_BAND_BITS)
    )
    hash_ctes = X.xxh64_str_ctes(
        "wh", "vocab", ["word"], "word", [(0, X.SPARK_HASH_SEED)]
    )
    return f"""
    WITH RECURSIVE
    documents_canon AS {SQL_DOCS_CANON},
    dw AS (
        SELECT DISTINCT doc_id, t.word
        FROM documents_canon, UNNEST(string_split(text, ' ')) AS t(word)
    ),
    vocab AS (SELECT DISTINCT word FROM dw),
    {hash_ctes},
    bits(i, p) AS (VALUES {bits}),
    votes AS (
        SELECT dw.doc_id, b.i,
               SUM(CASE WHEN (h.h // CAST(b.p AS HUGEINT)) % 2 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM dw JOIN wh_hash h ON h.word = dw.word CROSS JOIN bits b
        GROUP BY 1, 2
    ),
    fp AS (
        SELECT v.doc_id,
               CAST(SUM(CASE WHEN v.v > 0 THEN b.p ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM votes v JOIN bits b ON b.i = v.i GROUP BY 1
    ),
    bandtab(band_id, d) AS (VALUES {bands}),
    ex AS (
        SELECT fp.doc_id, fp.simhash, bandtab.band_id,
               (fp.simhash // bandtab.d) % {1 << SIMHASH_BAND_BITS} AS band_val
        FROM fp CROSS JOIN bandtab
    ),
    ann AS (
        SELECT doc_id, simhash, band_id, band_val,
               COUNT(*) OVER (PARTITION BY band_id, band_val) AS bsz,
               MIN(doc_id) OVER (PARTITION BY band_id, band_val) AS hub_id,
               FIRST_VALUE(simhash) OVER (PARTITION BY band_id, band_val
                                          ORDER BY doc_id) AS hub_sim
        FROM ex
    ),
    pairs AS (
        SELECT DISTINCT doc_a, doc_b, sim_a, sim_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sim_a, b.simhash AS sim_b
            FROM ann a JOIN ann b
              ON a.band_id = b.band_id AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            WHERE a.bsz <= {MAX_BUCKET_ALLPAIRS}
            UNION ALL
            SELECT hub_id, doc_id, hub_sim, simhash
            FROM ann WHERE bsz > {MAX_BUCKET_ALLPAIRS} AND doc_id <> hub_id
        )
    )
    SELECT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
    FROM pairs
    WHERE bit_count(xor(sim_a, sim_b)) <= {SIMHASH_MAX_HAMMING}
    """


@register(
    "simhash_neardup",
    oracle=_simhash_oracle(),
    doc="SimHash near-dup: 32-bit fingerprints, banded search, hamming <= 3.",
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical doc grain (r13 dup-entity leg; oracle mirrors)
    docs = entity_table(spark, sf_dir, "documents")
    return simhash_pairs(docs)


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    cap: int = MAX_BUCKET_ALLPAIRS,
) -> DataFrame:
    # One row per doc; materialized so the band self-join's two sides don't
    # recompute the 32-vote aggregation twice (same rationale as minhash).
    fp = simhash_fingerprints(scale_out(docs, "doc_id")).localCheckpoint(eager=True)
    nbands = SIMHASH_BITS // SIMHASH_BAND_BITS
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.shiftright("simhash", bi * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for bi in range(nbands)
        ]
    )
    ex = fp.select("doc_id", "simhash", F.explode(bands).alias("b")).select(
        "doc_id", "simhash", F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val")
    )
    # Hot-bucket bound: identical fingerprints (boilerplate) collapse to a
    # hub-star instead of an all-pairs blow-up; the fingerprint rides along
    # as payload so the hamming filter needs no extra join.
    pairs = capped_bucket_pairs(
        ex, ["band_id", "band_val"], "doc_id", cap, payload=("simhash",)
    )
    hamming = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    return (
        pairs.select(
            F.col("doc_id_a").alias("doc_a"),
            F.col("doc_id_b").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the verified-pair graph


#: Below this many (undirected) edges the component graph fits trivially on
#: the driver and a union-find beats ~8 tiny Spark jobs of label
#: propagation — the same adaptive-threshold idea as broadcast joins.
CC_DRIVER_EDGE_BOUND = 100_000


def _driver_union_find(rows, id_type) -> list[tuple]:
    """Min-root union-find over collected edge rows; path-compressed."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            # attach the larger root under the smaller -> root == min id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(v, find(v)) for v in parent]


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., CC in MapReduce and Beyond).

    For every node ``u`` with neighborhood Γ(u) (edges viewed undirected)
    and m = min(Γ(u) ∪ {u}), emit (v, m) for each strictly-larger neighbor
    v > u.  Hangs every high node directly off the local minimum, halving
    long chains each round.  One groupBy + one join, both keyed on node id.
    """
    und = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    mins = und.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: edges directed high→low (src > dst); for each
    node u with low-neighborhood N(u) and m = min(N(u)), emit (v, m) for
    every v ∈ N(u) ∪ {u} except m itself.  Flattens the low side into a
    star around the minimum."""
    d = (
        e.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))  # m < src by dir.
    return (
        d.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select("src", F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Distributed connected components via alternating large-star /
    small-star rounds -> (id, comp), comp = min id in the component.

    Unlike min-label propagation (O(graph diameter) rounds — linear on a
    path graph), the star exchange converges in O(log² n) rounds with
    per-round message volume bounded by the current edge count, which only
    shrinks — the property that makes it the standard 100 TB-scale CC
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14; same family as GraphFrames' default CC).  Every round is two
    keyed shuffles (groupBy min + join back) with ``localCheckpoint``
    truncating lineage so plan depth stays constant.  Convergence is
    detected by an edge-set fingerprint (count + sum + bit-XOR of
    xxhash64) — one tiny agg job per round instead of a set-diff join.
    """
    base = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("src"),
            F.least(F.col(src), F.col(dst)).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Vertex universe from the ORIGINAL edges (self-loops included): nodes
    # that end up as star centers or isolated still need an output row.
    verts = (
        base.select(F.col("src").alias("id"))
        .unionByName(base.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = base.filter(F.col("src") != F.col("dst"))
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        h = F.xxhash64("src", "dst")
        # decimal(38,0) sum: 64-bit hash sums overflow long under ANSI mode
        sig = tuple(
            e.agg(
                F.count(F.lit(1)),
                F.sum(h.cast("decimal(38,0)")),
                F.bit_xor(h),
            ).first()
        )
        if sig == prev_sig:  # star set stable -> converged
            break
        prev_sig = sig
    # Converged edge set is a disjoint star forest: (member, component min).
    return verts.join(
        e.withColumnRenamed("src", "id"), "id", "left"
    ).select("id", F.coalesce("dst", "id").alias("comp"))


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50
) -> DataFrame:
    """Adaptive connected components -> (id, comp): every vertex labeled
    with the smallest id reachable from it; one cluster per dup group.

    The deduplicated edge set is materialized once, and if it is under
    ``CC_DRIVER_EDGE_BOUND`` the components are solved with a driver-side
    union-find (near-dup graphs are SPARSE — edges ~ dup pairs, not corpus
    size — so this is the common case and costs zero extra Spark jobs).
    Larger graphs run the large-star/small-star exchange
    (``connected_components_star``), whose round count is O(log² n)
    regardless of graph diameter.  Both paths produce the identical
    labeling (min reachable id), so the cutover is invisible to callers —
    the same adaptive-threshold idea as broadcast-vs-shuffle joins.
    """
    # Materialize the edge list ONCE before anything fans out: callers
    # typically pass an expensive un-materialized pair pipeline (MinHash
    # verify join) — without the checkpoint the fan-out below would
    # execute that plan repeatedly.
    base = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)

    n_edges = base.count()  # cheap: counts the checkpointed blocks
    if n_edges <= CC_DRIVER_EDGE_BOUND:
        # Union-find needs neither direction-doubling nor dedup — raw
        # directed edges suffice, so the driver path skips those shuffles.
        id_type = base.schema[0].dataType
        labeled = _driver_union_find(
            [(r["src"], r["dst"]) for r in base.collect()], id_type
        )
        out_schema = T.StructType(
            [T.StructField("id", id_type), T.StructField("comp", id_type)]
        )
        return edges.sparkSession.createDataFrame(labeled, out_schema)

    return connected_components_star(base, "src", "dst", max_iter=max_iter)


def _materialize_ctes(sql: str, *names: str) -> str:
    """Mark the named CTEs ``AS MATERIALIZED`` in an oracle SQL string.

    DuckDB inlines (and so RE-EXECUTES) a CTE per reference site unless
    materialized; CTEs referenced from a recursive term re-run once per
    closure iteration (the 40s→4s CC-oracle lesson, r8).  Applied
    per-oracle rather than in the shared CTE constants because
    materialization HURTS single-downstream pipelines where inlining lets
    the optimizer push filters through (minhash_lsh_neardup measured
    slower with it)."""
    import re

    for n in names:
        sql, n_subs = re.subn(rf"\b{n} AS \(", f"{n} AS MATERIALIZED (", sql, count=1)
        # Fail loud on formatting drift in the shared CTE constants (e.g. a
        # newline between the name and "AS ("): a silent no-op here quietly
        # drops the 40s->4s recursive-oracle performance guard (ADVICE r9).
        if n_subs != 1:
            raise ValueError(f"CTE {n!r} not found to materialize in oracle SQL")
    return sql


def _neardup_cc_oracle() -> str:
    """DuckDB replay of near-dup clustering: the verified-pair graph from
    the minhash replay (_minhash_sig_band_ctes), then TRUE connected
    components via transitive closure — the Spark side's union-find /
    large-star result is algorithm-independent (min reachable doc_id), so
    any exact CC computation is a valid oracle.  Dup clusters are small,
    so the closure table stays tiny.  The multi-referenced pipeline CTEs
    (sh/sizes twice in the verify join, ann twice in cand, verified twice
    in und) are materialized -- measured 4.6s->2.8s at sf0.01 (r9 ask #5)."""
    return _materialize_ctes(
        f"""
    WITH RECURSIVE
    documents_canon AS {SQL_DOCS_CANON},
    {_minhash_sig_band_ctes(source="documents_canon")},
    {_MINHASH_PAIRS_CTES},
    -- MATERIALIZED: und is referenced from the recursive term, and an
    -- inlined CTE would re-run the ENTIRE minhash pipeline once per
    -- closure iteration (measured 40 s vs 4 s)
    und AS MATERIALIZED (
        SELECT doc_a AS s, doc_b AS d FROM verified
        UNION SELECT doc_b, doc_a FROM verified
    ),
    reach(id, r) AS (
        SELECT s, s FROM und
        UNION
        SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.id
    ),
    comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
    csz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY comp)
    SELECT c.id AS doc_id, c.comp AS cluster_id, z.cluster_size,
           CAST(c.id = c.comp AS INT) AS is_representative
    FROM comp c JOIN csz z ON z.comp = c.comp
    """,
        "verified",
        "ann",
        "sh",
        "sizes",
    )


@register(
    "neardup_cluster_components",
    oracle=_neardup_cc_oracle(),
    doc="Near-dup clustering: connected components (min-label propagation) "
    "over the MinHash-LSH verified-pair graph; representative = min doc_id.",
)
def neardup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs alone under-specify dedup (a~b, b~c but a!~c): clustering makes
    'keep one per group' well-defined — keep ``comp`` (the min doc_id), drop
    every other member.  Returns one row per clustered doc with its cluster
    id and the cluster size."""
    docs = entity_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    comp = connected_components(pairs, "doc_a", "doc_b")
    sizes = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("comp")).cast("int").alias("is_representative"),
        )
    )


# ---------------------------------------------------------------------------
# edit-distance fuzzy dedup (blocked)

FUZZY_PREFIX_LEN = 40    # compare fixed-length prefixes, not whole bodies
FUZZY_BLOCK_CHARS = 20   # blocking key: (lang, n_chars div 20)
FUZZY_MAX_DIST = 12


@register(
    "fuzzy_levenshtein_pairs",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               substring(text, 1, {FUZZY_PREFIX_LEN}) AS head,
               CAST(floor(n_chars / {FUZZY_BLOCK_CHARS}) AS BIGINT) AS blk
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist
    FROM s a JOIN s b
      ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= {FUZZY_MAX_DIST}
    """,
    doc="Edit-distance near-dup pairs: blocked (lang, length-band) "
    "self-join, levenshtein over fixed-length prefixes.",
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third dedup modality after set-overlap (MinHash/Jaccard) and
    bit-fingerprint (SimHash): character-level edit distance, the right
    tool for short near-identical strings (titles, URLs, product names).

    Levenshtein is O(len^2) per pair, so the join is *blocked*: only docs
    sharing (lang, length-band) ever compare, and only fixed-length
    prefixes are compared.  At 100 TB the same shape swaps the blocking
    key join for ``capped_bucket_pairs`` (hot length-bands bounded) —
    here it stays a plain equi-join so the DuckDB oracle can mirror it
    exactly.  No sampling: the (lang, length-band) blocking alone bounds
    the comparisons (~2.7 per doc on the test corpus)."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        "lang",
        F.substring("text", 1, FUZZY_PREFIX_LEN).alias("head"),
        F.floor(F.col("n_chars") / FUZZY_BLOCK_CHARS).cast("long").alias("blk"),
    )
    a = s.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("la"),
        F.col("head").alias("ha"), F.col("blk").alias("ba"),
    )
    b = s.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lb"),
        F.col("head").alias("hb"), F.col("blk").alias("bb"),
    )
    return (
        a.join(
            b,
            (F.col("la") == F.col("lb"))
            & (F.col("ba") == F.col("bb"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .withColumn("edit_dist", F.levenshtein("ha", "hb"))
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
        .select("doc_a", "doc_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# pyspark.ml bridge: MinHashLSH + approxSimilarityJoin

ML_LSH_TABLES = 8
ML_JACCARD_SIM = 0.4  # pair threshold: estimated Jaccard similarity >= 0.4


def ml_minhash_pairs(docs: DataFrame, threshold: float = ML_JACCARD_SIM) -> DataFrame:
    """MinHash near-dup pairs via the stock ``pyspark.ml.feature`` stack
    (SURVEY.md §2b names this exact composition): RegexTokenizer ->
    3-gram shingles -> HashingTF binary vectors -> MinHashLSH ->
    ``approxSimilarityJoin``.

    Same algorithm as the hand-rolled ``minhash_lsh_pairs`` but executed
    by Spark ML's JVM implementation — the bucketed self-join and
    candidate verification happen inside ``approxSimilarityJoin`` (an
    explode-on-hash-table equi-join, NOT all-pairs), so the scale shape
    matches the hand-rolled path.  Seeded: deterministic across runs.
    The hand-rolled variant remains the primary path because it exposes
    the banding/capping knobs (``capped_bucket_pairs``) ML hides.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    # docs WITH text only (r12 NULL-heavy sweep): RegexTokenizer throws
    # on a NULL input column, and a contentless doc has no shingles
    docs = docs.filter(F.col("text").isNotNull())
    tok = RegexTokenizer(
        inputCol="text", outputCol="toks", pattern=r"\s+", toLowercase=True
    )
    ng = NGram(n=3, inputCol="toks", outputCol="shingles")
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    staged = tf.transform(ng.transform(tok.transform(docs)))
    # MinHashLSH requires >=1 non-zero feature: 3-gram shingling needs
    # at least 3 tokens (corpus min is 10).
    staged = staged.filter(F.size("shingles") > 0).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=ML_LSH_TABLES, seed=42
    )
    model = lsh.fit(staged)
    joined = model.approxSimilarityJoin(
        staged, staged, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
    )


#: DuckDB twin of the ml_minhash certificate: the MinHashLSH hash family
#: is JVM-internal RNG, so the PAIR SET is engine-specific — but every
#: emitted pair must satisfy data-level invariants (canonical order, no
#: duplicates, similarity equal to the true Jaccard of the hashed shingle
#: sets, similarity above the join threshold), projected as booleans the
#: oracle expects TRUE (r11 VERDICT ask #1; precedent: the r6
#: sketch-family invariant oracles).
ML_MINHASH_CERT_ORACLE = """
    SELECT TRUE AS pairs_canonical,
           TRUE AS pairs_distinct,
           TRUE AS sims_match_true_jaccard,
           TRUE AS sims_ge_threshold
    """


def ml_minhash_certificate(
    docs: DataFrame, pairs: DataFrame, threshold: float = ML_JACCARD_SIM
) -> DataFrame:
    """Single-row invariant certificate over ``ml_minhash_pairs`` output.

    The similarity recompute is INDEPENDENT of pyspark.ml: tokenization
    and 3-gram shingling are replayed with built-in SQL functions
    (lower/split/slice/concat_ws — the RegexTokenizer/NGram contract),
    and the HashingTF bucket of each shingle is replayed with the
    spec-correct MurmurHash3_x86_32 (functions/murmur3.py; Spark SQL's
    ``F.hash`` uses the block-lenient tail mixer and diverges on byte
    lengths not divisible by 4).  ``sims_match_true_jaccard`` carries a
    2e-6 tolerance: the emitted value is round(1 - dist, 6) and
    ``1 - (1 - x)`` re-rounds at the last ulp.

    Scale shape: only docs appearing in emitted pairs are re-featurized
    (left-semi on a broadcast id list), so the certificate costs
    O(pairs) regardless of corpus size; the hash replay is an
    Arrow-batched pandas UDF over that bounded set."""
    from azure_func_forem_data_etl_spark.functions.murmur3 import (
        hashing_tf_bucket,
    )

    # pin the (small) pair set: it feeds the id list twice and the
    # verification join once, and its ml-pipeline lineage re-scans the
    # corpus per reference (plan-lint scan budget).  persist(), NOT
    # localCheckpoint (r12 ADVICE #3): eager=True executed the full
    # MinHashLSH fit + approxSimilarityJoin at plan-CONSTRUCTION time,
    # breaking the registry-wide "builders return lazy plans" contract,
    # and even eager=False runs the AQE query stages at build because
    # Dataset.checkpoint needs the executed RDD.  persist is fully lazy
    # (tests/test_certificates.py pins zero build jobs), hides the
    # lineage behind InMemoryTableScan for the scan-budget lint, and the
    # first action computes the pair set once into cache (at most twice
    # if concurrent broadcast stages race the cache fill — bounded).
    # The handful of cached rows live for the session; the pair set is
    # O(near-dup pairs above 0.8 Jaccard), tiny by construction.
    pairs = pairs.persist()
    ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    involved = docs.join(F.broadcast(ids), "doc_id", "left_semi").select(
        "doc_id", "text"
    )
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = involved.select("doc_id", shingles.alias("__sh"))

    @F.pandas_udf("array<int>")
    def _buckets(s: pd.Series) -> pd.Series:
        return s.apply(
            lambda arr: sorted({hashing_tf_bucket(x, 1 << 18) for x in arr})
        )

    feats = sh.select("doc_id", _buckets("__sh").alias("__f"))
    j = (
        F.broadcast(pairs)
        .join(feats.withColumnsRenamed({"doc_id": "doc_a", "__f": "__fa"}), "doc_a")
        .join(feats.withColumnsRenamed({"doc_id": "doc_b", "__f": "__fb"}), "doc_b")
    )
    true_sim = F.size(F.array_intersect("__fa", "__fb")).cast("double") / F.size(
        F.array_union("__fa", "__fb")
    ).cast("double")
    flags = j.select(
        "doc_a",
        "doc_b",
        "jaccard_sim",
        (F.col("doc_a") < F.col("doc_b")).alias("__canon"),
        (F.abs(F.col("jaccard_sim") - true_sim) <= 2e-6).alias("__match"),
        (F.col("jaccard_sim") >= F.lit(threshold) - 1e-6).alias("__ge"),
    )
    t = F.lit(True)
    return flags.agg(
        F.coalesce(F.bool_and("__canon"), t).alias("pairs_canonical"),
        (F.count("*") == F.countDistinct(F.struct("doc_a", "doc_b"))).alias(
            "pairs_distinct"
        ),
        F.coalesce(F.bool_and("__match"), t).alias("sims_match_true_jaccard"),
        F.coalesce(F.bool_and("__ge"), t).alias("sims_ge_threshold"),
    )


@register(
    "ml_minhash_neardup",
    # Promoted rows-only -> certificate oracle in r12 (r11 VERDICT ask
    # #1): the LSH hash family stays engine-internal, but every emitted
    # pair's invariants hash-check (see ml_minhash_certificate).  The
    # raw pair form stays available via ml_minhash_pairs; recall floors
    # are pytest-asserted (tests/test_llm_ops.py).
    oracle=ML_MINHASH_CERT_ORACLE,
    doc="MinHash-LSH near-dup pairs via pyspark.ml MinHashLSH + "
    "approxSimilarityJoin (the SURVEY §2b stock-ML composition); output "
    "projected as a single-row invariant certificate.",
)
def ml_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # canonical doc grain (r13 dup-entity leg): the certificate replay
    # re-featurizes pair members BY ID, which is ambiguous if an id
    # carries two drifted payloads
    docs = entity_table(spark, sf_dir, "documents")
    return ml_minhash_certificate(docs, ml_minhash_pairs(docs))


# ---------------------------------------------------------------------------
# prefix-filtering set-similarity join (AllPairs/PPJoin family — the exact
# counterpart of the MinHash-LSH probabilistic path; cf. "Highly Efficient
# String Similarity Search and Join over Compressed Indexes", ICDE 2022)

PREFIX_JOIN_THRESHOLD = 0.6  # jaccard over distinct word-bigram sets


@register(
    "prefix_filter_simjoin",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bg AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(ts)),
                                     i -> ts[i] || ' ' || ts[i + 1])) AS tok
        FROM toks WHERE len(ts) >= 2
    ),
    freq AS (SELECT tok, count(*) AS f FROM bg GROUP BY tok),
    sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
    ranked AS (
        SELECT bg.doc_id, bg.tok,
               row_number() OVER (
                   PARTITION BY bg.doc_id ORDER BY freq.f, bg.tok
               ) AS rn,
               sizes.n
        FROM bg JOIN freq USING (tok) JOIN sizes USING (doc_id)
    ),
    prefix AS (
        SELECT doc_id, tok FROM ranked
        WHERE rn <= n - ((3 * n + 4) // 5) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS i
        FROM cand c
        JOIN bg x ON x.doc_id = c.doc_a
        JOIN bg y ON y.doc_id = c.doc_b AND y.tok = x.tok
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.i AS INT) AS inter_size,
           round(i.i / CAST(sa.n + sb.n - i.i AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.i / CAST(sa.n + sb.n - i.i AS DOUBLE)
          >= {PREFIX_JOIN_THRESHOLD}
    """,
    doc=f"Exact set-similarity self-join via prefix filtering "
    f"(AllPairs/PPJoin): word-bigram sets, jaccard >= "
    f"{PREFIX_JOIN_THRESHOLD}; candidates only where rare-token prefixes "
    "collide, then exact verification.",
)
def prefix_filter_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT high-threshold near-dup path — prefix filtering
    guarantees no missed pair above the threshold (vs MinHash-LSH's
    probabilistic recall): a pair with jaccard >= t MUST share a token
    within each side's first n - ceil(t*n) + 1 tokens when both sets are
    sorted by global rarity.  Rare-first ordering makes prefix collisions
    scarce, so the candidate set stays near-linear on real corpora.

    Scale shape: tokenize once (distinct doc-bigram pairs), one
    vocabulary-sized frequency table (broadcastable), per-doc prefix via
    WindowGroupLimit-eligible row_number, candidate equi-join keyed on
    prefix tokens only, and exact verification joins confined to the
    candidate pairs.  Prefix lengths use pure integer arithmetic
    (ceil(3n/5) = (3n+4) div 5) — no float boundary drift between
    engines."""
    docs = table(spark, sf_dir, "documents")
    ts = F.split("text", " ")
    bg = (
        docs.select("doc_id", ts.alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.concat(
                        F.element_at(F.col("ts"), i),
                        F.lit(" "),
                        F.element_at(F.col("ts"), i + F.lit(1)),
                    ),
                )
            ).alias("tok"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # consumed by freq, sizes, prefix, verify x2
    )
    freq = bg.groupBy("tok").agg(F.count("*").alias("f"))
    sizes = bg.groupBy("doc_id").agg(F.count("*").alias("n"))
    ranked = (
        bg.join(F.broadcast(freq), "tok")
        .join(F.broadcast(sizes), "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("f", "tok")
            ),
        )
    )
    pref_len = F.col("n") - F.expr("(3 * n + 4) div 5") + 1
    prefix = ranked.filter(F.col("rn") <= pref_len).select("doc_id", "tok")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    x, y = bg.alias("x"), bg.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.tok") == F.col("x.tok")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(j >= PREFIX_JOIN_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            F.col("i").cast("int").alias("inter_size"),
            F.round(j, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Cross-doc exact substring overlap (suffix-array-dedup analog)
#
# Suffix-array dedup ("Deduplicating Training Data Makes Language Models
# Better", Lee et al. 2022) finds *verbatim shared substrings* between
# documents — a different signal from shingle Jaccard, which scores whole
# docs.  The distributed analog: slide a fixed W-char window at stride S
# over every document, join docs that share a window verbatim, and rank
# pairs by how many windows they share.  Stride-S sampling still catches
# every shared run of length >= W + S - 1 (some window of the run must
# start on a stride point in both docs only if alignment matches; with
# stride S both docs sample the run's windows at the same offsets relative
# to the run's own text, because windows are content-defined here by the
# JOIN — any window fully inside the run appears in both docs verbatim, and
# a run of length L >= W + S - 1 contains a stride-aligned window start in
# any alignment).  Row volume is ~len/S per doc, tunable independently of
# precision (W).
#
# 100 TB shape: windows shuffle as strings here for oracle bit-parity; at
# scale the groupBy key is xxhash64(window) (8 bytes) with the string kept
# only through the first aggregation.  Hot windows (site boilerplate,
# license headers) are dropped above SUBSTR_HOT_CAP docs — same bounded-
# bucket discipline as the MinHash band join, making worst-case pair
# fan-out O(cap^2) per window instead of O(n^2).

SUBSTR_W = 40        # window width: the verbatim-match precision
SUBSTR_STRIDE = 20   # hop: row volume is ~n_chars/20 per doc
SUBSTR_MIN_SHARED = 2   # pairs must share >= this many distinct windows
SUBSTR_HOT_CAP = 64  # windows in more docs than this are boilerplate


@register(
    "substring_overlap_pairs",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE length(text) >= {SUBSTR_W}
    ),
    w AS (
        SELECT DISTINCT doc_id,
               substr(text, CAST(off AS INT), {SUBSTR_W}) AS win
        FROM d, UNNEST(range(1, length(text) - {SUBSTR_W - 2}, {SUBSTR_STRIDE})) AS t(off)
    ),
    eligible AS (
        SELECT win FROM w GROUP BY win
        HAVING COUNT(*) BETWEEN 2 AND {SUBSTR_HOT_CAP}
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.win
        FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
        JOIN eligible e ON e.win = a.win
    )
    SELECT doc_a, doc_b, COUNT(DISTINCT win) AS shared_windows
    FROM p GROUP BY doc_a, doc_b
    HAVING COUNT(DISTINCT win) >= {SUBSTR_MIN_SHARED}
    """,
    doc=f"Cross-doc verbatim substring overlap: {SUBSTR_W}-char windows at stride {SUBSTR_STRIDE}, boilerplate-capped, pairs sharing >= {SUBSTR_MIN_SHARED} windows.",
)
def substring_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text", F.length("text").alias("len"))
        .filter(F.col("len") >= SUBSTR_W)
    )
    offs = F.sequence(
        F.lit(1), F.col("len") - F.lit(SUBSTR_W - 1), F.lit(SUBSTR_STRIDE)
    )
    # consumed by the support agg AND the semi-join back — pin the window
    # explode once (MEMORY_AND_DISK; one materialization beats re-running
    # the corpus explode per reference)
    wins = (
        docs.select("doc_id", "text", F.explode(offs).alias("off"))
        .select(
            "doc_id",
            F.expr(f"substring(text, off, {SUBSTR_W})").alias("win"),
        )
        .localCheckpoint(eager=True)
    )
    # Window support by DISTINCT doc (count_distinct folds the dedup into
    # the same aggregation instead of a separate distinct() exchange);
    # keep only shareable, non-boilerplate windows.  The eligible set is
    # corpus-sized (windows), so this is a shuffle semi-join on win, not
    # a broadcast.  Intra-doc repeats of a window survive into the pair
    # join (bounded fanout: repeats within one doc) and are collapsed by
    # the final count_distinct, so results are unchanged.
    eligible = (
        wins.groupBy("win")
        .agg(F.count_distinct("doc_id").alias("cnt"))
        .filter((F.col("cnt") >= 2) & (F.col("cnt") <= SUBSTR_HOT_CAP))
        .select("win")
    )
    # both pair sides read it — pin the (already support-capped) frame
    shared = wins.join(eligible, "win").localCheckpoint(eager=True)
    a = shared.select(F.col("doc_id").alias("doc_a"), "win")
    b = shared.select(F.col("doc_id").alias("doc_b"), "win")
    return (
        a.join(b, ["win"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count_distinct("win").alias("shared_windows"))
        .filter(F.col("shared_windows") >= SUBSTR_MIN_SHARED)
    )


# --- Fellegi-Sunter probabilistic record linkage --------------------------

#: Per-field (m, u) probabilities: P(agree | match) and P(agree | non-match).
#: Fixed priors here (a production fit estimates them with EM over the
#: blocked pairs — same pipeline shape, one extra agg per EM round).
FS_FIELDS = (
    ("agree_balband", 0.90, 0.10),  # account-balance thousand-band
    ("agree_namedig", 0.85, 0.10),  # trailing digit of the entity name
    ("agree_balsign", 0.95, 0.50),  # balance sign (weak field, low payoff)
)
FS_TOP_N = 50


def _fs_weight(name: str, m: float, u: float):
    import math

    agree_w = math.log2(m / u)
    disagree_w = math.log2((1 - m) / (1 - u))
    return F.when(F.col(name) == 1, F.lit(agree_w)).otherwise(F.lit(disagree_w))


def _fs_weight_sql(name: str, m: float, u: float) -> str:
    import math

    return (
        f"CASE WHEN {name} = 1 THEN {math.log2(m / u)!r} "
        f"ELSE {math.log2((1 - m) / (1 - u))!r} END"
    )


@register(
    "record_linkage_fs",
    oracle=f"""
    WITH pairs AS (
        SELECT c.c_custkey AS cust_id, s.s_suppkey AS supp_id,
               CAST(floor(c.c_acctbal / 1000.0) = floor(s.s_acctbal / 1000.0)
                    AS INT) AS agree_balband,
               CAST(substring(c.c_name, -1, 1) = substring(s.s_name, -1, 1)
                    AS INT) AS agree_namedig,
               CAST((c.c_acctbal < 0) = (s.s_acctbal < 0) AS INT)
                   AS agree_balsign
        FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
    )
    SELECT cust_id, supp_id, agree_balband, agree_namedig, agree_balsign,
           round({_fs_weight_sql('agree_balband', *FS_FIELDS[0][1:])}
                 + {_fs_weight_sql('agree_namedig', *FS_FIELDS[1][1:])}
                 + {_fs_weight_sql('agree_balsign', *FS_FIELDS[2][1:])}, 6)
               AS fs_score
    FROM pairs
    ORDER BY fs_score DESC, cust_id, supp_id
    LIMIT {FS_TOP_N}
    """,
    doc=f"Fellegi-Sunter probabilistic record linkage: nation-blocked "
    f"customer x supplier pairs scored by log2(m/u) agreement weights, "
    f"top-{FS_TOP_N} candidates.",
)
def record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage (Fellegi & Sunter 1969) — the fourth
    dedup modality after set-overlap, bit-fingerprint, and edit-distance:
    per-field agreement patterns scored with log-likelihood-ratio weights
    (agree on field i -> +log2(m_i/u_i), disagree -> +log2((1-m_i)/(1-u_i))),
    the optimal linear classifier under field independence.  High scores
    are links, low scores non-links, the middle band goes to clerical
    review in a real MDM deployment.

    Scale shape: the pair space is BLOCKED on nationkey (same discipline
    as the levenshtein blocking above — never an unblocked cross
    product); field comparisons and weights are row-local expressions on
    the joined pairs; top-N compiles to TakeOrderedAndProject.  At
    100 TB the block key gets refined (nation x balance-band) exactly
    like the length-band blocking, bounding any hot block.
    """
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("c_bal"),
        F.col("c_name").alias("c_nm"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        F.col("s_nationkey").alias("nk"),
        F.col("s_acctbal").alias("s_bal"),
        F.col("s_name").alias("s_nm"),
    )
    pairs = cust.join(supp, "nk").select(
        "cust_id",
        "supp_id",
        (F.floor(F.col("c_bal") / 1000.0) == F.floor(F.col("s_bal") / 1000.0))
        .cast("int")
        .alias("agree_balband"),
        (F.substring("c_nm", -1, 1) == F.substring("s_nm", -1, 1))
        .cast("int")
        .alias("agree_namedig"),
        ((F.col("c_bal") < 0) == (F.col("s_bal") < 0)).cast("int").alias("agree_balsign"),
    )
    score = sum(
        (_fs_weight(nm, m, u) for nm, m, u in FS_FIELDS), F.lit(0.0)
    )
    return (
        pairs.withColumn("fs_score", F.round(score, 6))
        .orderBy(F.col("fs_score").desc(), "cust_id", "supp_id")
        .limit(FS_TOP_N)
    )


# --- Incremental near-dup maintenance -------------------------------------

#: Per-(band, bucket) membership cap on the EXISTING side of the
#: incremental join — a new doc landing in a boilerplate mega-bucket
#: compares against a deterministic bounded prefix of it, mirroring the
#: hot-bucket philosophy of ``capped_bucket_pairs``.
INCR_BUCKET_CAP = 64


def minhash_incremental_pairs(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = MINHASH_VERIFY_THRESHOLD,
) -> DataFrame:
    """Near-dup pairs INVOLVING A NEW DOC: new-vs-old and new-vs-new,
    never old-vs-old — the maintenance operation a daily ingest runs
    against an already-deduped corpus, priced by the DELTA, not the
    corpus.

    The asymmetric bucket join is the point: only NEW docs' band rows sit
    on the probe side, so candidate generation is
    O(|new| x bucket-occupancy), and the existing side is bounded per
    bucket (INCR_BUCKET_CAP) against boilerplate mega-buckets.  At 100 TB
    the existing side's signatures/band rows come from the PERSISTED
    signature index (one parquet table keyed by (band_id, band_hash) —
    exactly ``minhash_signatures`` output); recomputing them here keeps
    the test self-contained without changing the join shape.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, verified exact
    Jaccard >= threshold, at least one side new.
    """
    from pyspark.sql.window import Window

    spark = old_docs.sparkSession
    tagged = old_docs.select("doc_id", "text").withColumn(
        "is_new", F.lit(0)
    ).unionByName(new_docs.select("doc_id", "text").withColumn("is_new", F.lit(1)))
    sh = word_shingles(scale_out(tagged, "doc_id"), MINHASH_NGRAM)
    sh = sh.localCheckpoint(eager=True)
    sig = minhash_signatures(sh).localCheckpoint(eager=True)
    flags = tagged.select("doc_id", "is_new")
    r = MINHASH_K // MINHASH_BANDS
    bands = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.xxhash64(*[f"mh_{bi * r + j}" for j in range(r)]).alias("band_hash"),
            )
            for bi in range(MINHASH_BANDS)
        ]
    )
    exploded = (
        sig.join(flags, "doc_id")
        .select("doc_id", "is_new", F.explode(bands).alias("b"))
        .select("doc_id", "is_new", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    )
    probe = exploded.filter(F.col("is_new") == 1).select(
        F.col("doc_id").alias("doc_new"), "band_id", "band_hash"
    )
    # Existing side = ALL docs (new-vs-new dups matter too), capped per
    # bucket by a deterministic min-id prefix.
    wb = Window.partitionBy("band_id", "band_hash").orderBy("doc_id")
    build = (
        exploded.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") <= INCR_BUCKET_CAP)
        .select(F.col("doc_id").alias("doc_any"), "band_id", "band_hash")
    )
    cand = (
        probe.join(build, ["band_id", "band_hash"])
        .filter(F.col("doc_new") != F.col("doc_any"))
        .select(
            F.least("doc_new", "doc_any").alias("doc_a"),
            F.greatest("doc_new", "doc_any").alias("doc_b"),
        )
        .distinct()
    )
    sizes = sig.select("doc_id", "n_sh")
    return verify_jaccard(cand, sh, sizes).filter(F.col("jaccard") >= threshold)


def _minhash_incremental_oracle() -> str:
    """DuckDB replay of the incremental maintenance query: same signature
    and band machinery as the lsh oracle, asymmetric probe (new docs =
    doc_id % 5 = 0) against a per-bucket min-id prefix of ALL docs
    (row_number <= INCR_BUCKET_CAP, the deterministic cap), then the
    exact-Jaccard verification."""
    return f"""
    WITH RECURSIVE
    documents_canon AS {SQL_DOCS_CANON},
    {_minhash_sig_band_ctes(source="documents_canon")},
    exploded AS (
        SELECT doc_id, band_id, h AS band_hash,
               CAST(doc_id % 5 = 0 AS INT) AS is_new,
               row_number() OVER (PARTITION BY band_id, h
                                  ORDER BY doc_id) AS rn
        FROM bh_hash
    ),
    cand AS (
        SELECT DISTINCT
               LEAST(p.doc_id, b.doc_id) AS doc_a,
               GREATEST(p.doc_id, b.doc_id) AS doc_b
        FROM exploded p
            JOIN exploded b
              ON b.band_id = p.band_id AND b.band_hash = p.band_hash
        WHERE p.is_new = 1 AND b.rn <= {INCR_BUCKET_CAP}
          AND p.doc_id <> b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter)
               AS jaccard
    FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter)
          >= {MINHASH_VERIFY_THRESHOLD}
    """


@register(
    "minhash_incremental_neardup",
    oracle=_minhash_incremental_oracle(),
    doc="Incremental MinHash-LSH maintenance: near-dup pairs involving the "
    "20% newest docs only (new-vs-all asymmetric bucket join, capped "
    "buckets, exact-Jaccard verification).",
)
def minhash_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = entity_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_incremental_pairs(old, new)


@register(
    "dup_cluster_size_histogram",
    defer=True,
    oracle="""
    WITH g AS (
        SELECT md5(text) AS fp, CAST(COUNT(*) AS BIGINT) AS sz
        FROM documents GROUP BY 1
    )
    SELECT sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removed
    FROM g GROUP BY sz
    """,
    doc="Exact-duplicate cluster-size histogram: clusters, docs, and "
    "removal counts per copy-count — the dedup planning view.",
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning companion to dedup_exact_text (which lists clusters):
    HOW duplicated is the corpus — a long tail of 2-copies needs a
    different strategy than a few 10k-copy boilerplate clusters, and
    n_removed per size is the exact deduped-corpus shrinkage.  Two
    integer aggregations (hash-group, then histogram); output bounded by
    the max copy count.
    """
    docs = table(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5("text").alias("fp")).agg(F.count("*").alias("sz"))
    return g.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
        (F.sum("sz") - F.count("*")).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# Blocking-quality audit (round 8)


@register(
    "blocking_quality_audit",
    defer=2,
    oracle=f"""
    WITH blk AS (
        SELECT doc_id, md5(text) AS fp, lang,
               CAST(n_chars // {FUZZY_BLOCK_CHARS} AS BIGINT) AS band
        FROM documents
    ),
    truth AS (
        SELECT CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS n_true
        FROM (SELECT COUNT(*) AS sz FROM blk GROUP BY fp)
    ),
    cand AS (
        SELECT CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS n_cand
        FROM (SELECT COUNT(*) AS sz FROM blk GROUP BY lang, band)
    ),
    -- true pairs CAUGHT by the blocking: same fp AND same block
    caught AS (
        SELECT CAST(SUM(sz * (sz - 1) // 2) AS BIGINT) AS n_caught
        FROM (SELECT COUNT(*) AS sz FROM blk GROUP BY fp, lang, band)
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM blk)
    SELECT t.n_docs,
           (SELECT n_true FROM truth) AS n_true_pairs,
           (SELECT n_cand FROM cand) AS n_candidate_pairs,
           (SELECT n_caught FROM caught) AS n_caught_pairs,
           CAST(1000000 * (SELECT n_caught FROM caught)
                // GREATEST((SELECT n_true FROM truth), 1) AS BIGINT)
               AS pair_completeness_ppm,
           CAST(1000000 - 1000000 * (SELECT n_cand FROM cand)
                // (t.n_docs * (t.n_docs - 1) // 2) AS BIGINT)
               AS reduction_ratio_ppm
    FROM tot t
    -- degenerate contract (r11 single-row sweep): with < 2 documents the
    -- all-pairs space is empty and the reduction ratio undefined — no
    -- rows on BOTH engines
    WHERE t.n_docs > 1
    """,
    doc="Blocking-quality audit of the (lang, length-band) dedup blocking: "
    "pair completeness vs exact-duplicate ground truth and reduction "
    "ratio vs the all-pairs space, both in ppm (integer-exact).",
)
def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two numbers every blocking scheme is judged by (Christen 2012):
    completeness (what fraction of TRUE duplicate pairs share a block —
    recall ceiling of any downstream matcher) and reduction ratio (what
    fraction of the quadratic pair space the blocking avoids).  Ground
    truth here is the exact md5 clusters, so the audit is self-contained.
    Three hash-group aggregations over group-size combinatorics — counts
    only, no pair materialization anywhere, ppm via integral division.
    """
    docs = table(spark, sf_dir, "documents")
    # four driver-side aggregations over one small frame — checkpoint it
    # once, and RELEASE the blocks when the counts are in (the frame is
    # dead after `pairs`; DataFrame.unpersist is a no-op on checkpoints)
    blk, release_blk = scoped_checkpoint(
        docs.select(
            F.md5("text").alias("fp"),
            "lang",
            F.floor(F.col("n_chars") / FUZZY_BLOCK_CHARS).cast("long").alias("band"),
        )
    )

    def pairs(df, *keys):
        g = df.groupBy(*keys).agg(F.count("*").alias("sz"))
        return g.agg(
            F.sum(F.expr("sz * (sz - 1) div 2")).alias("p")
        ).collect()[0]["p"]

    n_docs = blk.count()
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("n_docs", T.LongType()),
            T.StructField("n_true_pairs", T.LongType()),
            T.StructField("n_candidate_pairs", T.LongType()),
            T.StructField("n_caught_pairs", T.LongType()),
            T.StructField("pair_completeness_ppm", T.LongType()),
            T.StructField("reduction_ratio_ppm", T.LongType()),
        ]
    )
    if n_docs < 2:
        # degenerate contract (see oracle): no all-pairs space to reduce
        release_blk()
        return docs.sparkSession.createDataFrame([], schema)
    n_true = int(pairs(blk, "fp"))
    n_cand = int(pairs(blk, "lang", "band"))
    n_caught = int(pairs(blk, "fp", "lang", "band"))
    release_blk()  # all consumers driven; drop the checkpoint's blocks
    total_pairs = n_docs * (n_docs - 1) // 2
    return docs.sparkSession.createDataFrame(
        [
            (
                n_docs,
                n_true,
                n_cand,
                n_caught,
                1000000 * n_caught // max(n_true, 1),
                1000000 - 1000000 * n_cand // total_pairs,
            )
        ],
        schema,
    )


# ---------------------------------------------------------------------------
# Containment near-dup (round 9): Broder containment for ASYMMETRIC overlap

CONTAIN_NGRAM = 4        # wider shingles: containment needs discriminative grams
CONTAIN_DF_CAP = 16      # blocking shingles: document frequency 2..cap
CONTAIN_THRESH_PPM = 500_000  # |A∩B| / min(|A|,|B|) >= 0.5


@register(
    "shingle_containment_pairs",
    defer=3,
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    csh AS MATERIALIZED ({{}}),
    csizes AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM csh GROUP BY 1
    ),
    cdf AS (
        SELECT shingle FROM csh GROUP BY shingle
        HAVING COUNT(*) BETWEEN 2 AND {CONTAIN_DF_CAP}
    ),
    ccand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM csh a
            JOIN cdf r ON r.shingle = a.shingle
            JOIN csh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
    ),
    cinter AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM ccand c
            JOIN csh sa ON sa.doc_id = c.doc_a
            JOIN csh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.n_inter,
           CAST(1000000 * i.n_inter // LEAST(za.n_sh, zb.n_sh) AS BIGINT)
               AS containment_ppm
    FROM cinter i
        JOIN csizes za ON za.doc_id = i.doc_a
        JOIN csizes zb ON zb.doc_id = i.doc_b
    WHERE 1000000 * i.n_inter >= {CONTAIN_THRESH_PPM} * LEAST(za.n_sh, zb.n_sh)
    """.format(_sql_shingles(CONTAIN_NGRAM, source="documents_canon")),
    doc=f"Containment near-dup (Broder): pairs where the smaller doc's "
    f"{CONTAIN_NGRAM}-gram shingle set is >=50% inside the larger's — the "
    "quote/subset relationship Jaccard under-scores on asymmetric "
    "lengths; candidates blocked on rare shingles (df 2..16).",
)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard misses subsumption: a 50-word quote inside a 5,000-word doc
    has J ~ 0.01 but containment ~ 1.0 — exactly the duplication an LLM
    corpus wants flagged (Broder 1997's other resemblance measure).
    Candidate generation blocks on RARE shingles (document frequency
    2..16): every candidate pair shares a discriminative gram, and the
    per-shingle pair fanout is capped at C(cap,2) — never corpus-
    quadratic.  Verification is an exact intersection count on the
    candidate set; the score is an integral ppm so the oracle compare is
    bit-exact.  Recall caveat (stated, like the LSH hot-bucket cap): a
    contained pair sharing ONLY stop-shingles (df > cap) is not found —
    at 50% containment of a >=2-shingle doc the pair almost surely shares
    a rare gram.  100 TB shape: one shingle-keyed agg for df, one
    df-capped self-join, one intersection agg — all keyed shuffles on
    shingle/doc ids.
    """
    docs = entity_table(spark, sf_dir, "documents")
    # Six consumers below (sizes, rare, a, b, sa, sb) — Spark re-derives a
    # non-broadcast subplan per reference, so materialize the explode once.
    sh = word_shingles(docs, CONTAIN_NGRAM).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= CONTAIN_DF_CAP))
        .select("shingle")
    )
    a, b = sh.alias("a"), sh.alias("b")
    cand = (
        a.join(rare, "shingle")
        .join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    scored = (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .filter(
            F.lit(1000000) * F.col("n_inter")
            >= F.lit(CONTAIN_THRESH_PPM) * F.least("na", "nb")
        )
    )
    return scored.select(
        "doc_a",
        "doc_b",
        "n_inter",
        F.expr(
            "CAST(CAST(1000000 AS BIGINT) * n_inter div least(na, nb) AS LONG)"
        ).alias("containment_ppm"),
    )

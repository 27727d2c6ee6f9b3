"""BPE tokenizer training primitives over the documents corpus — the
data-side half of building an LLM tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the same
word-type/pair-count loop GPT-2's byte-level BPE trains with).

The key scale fact of BPE training: after the first aggregation the
working set is the WORD-TYPE table (distinct words with counts), which is
sublinear in corpus bytes (Heaps' law) — so the corpus is scanned exactly
once, and every merge iteration runs over the vocabulary table, not the
corpus.  Pair counting per iteration is one explode + keyed aggregation;
the argmax is a 1-row TakeOrdered; applying a merge touches only the
word types that actually CONTAIN the pair (a JVM `exists` predicate
splits the table) with an Arrow-vectorized rewrite.

Reference parity: the reference ETL has no tokenizer surface; this is
SURVEY §2b LLM-pipeline territory (token counting already exists in
text.py — this module is the training side of the same stack).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

#: Number of merge rounds the registered query learns.  Real tokenizers
#: run 30k-100k rounds with the same per-round plan; each round here is
#: one vocab-table aggregation + one bounded rewrite, so rounds scale
#: linearly and independently of corpus size.
BPE_MERGES = 6

FIRST_PAIRS_TOP_N = 20


def word_type_table(docs: DataFrame) -> DataFrame:
    """(word, n) word-type counts: split on single spaces (the corpus-wide
    tokenizer convention — identical to the oracle's string_split), empty
    tokens dropped on both sides."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


_PAIRS_EXPR = (
    "transform(sequence(1, size(s) - 1), "
    "i -> struct(element_at(s, i) AS left_sym, element_at(s, i + 1) AS right_sym))"
)


def _pair_counts(syms: DataFrame) -> DataFrame:
    """(left_sym, right_sym, pair_count): adjacent-symbol pair counts
    weighted by word-type frequency."""
    return (
        syms.filter(F.size("s") >= 2)
        .select(F.col("n"), F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy(F.col("p.left_sym").alias("left_sym"), F.col("p.right_sym").alias("right_sym"))
        .agg(F.sum("n").alias("pair_count"))
    )


@register(
    "bpe_first_pairs",
    oracle=f"""
    WITH words AS (
        SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ) WHERE word <> '' GROUP BY word
    ),
    syms AS (SELECT n, string_split(word, '') AS s FROM words),
    pairs AS (
        SELECT n,
               unnest(list_transform(range(1, len(s)),
                      i -> struct_pack(l := s[i], r := s[i + 1]))) AS p
        FROM syms WHERE len(s) >= 2
    )
    SELECT p.l AS left_sym, p.r AS right_sym,
           CAST(SUM(n) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT {FIRST_PAIRS_TOP_N}
    """,
    doc=f"BPE round-0 statistics: top-{FIRST_PAIRS_TOP_N} adjacent "
    "character pairs weighted by word-type frequency (the first merge's "
    "candidate table).",
)
def bpe_first_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact pair-count table BPE's first merge decision reads —
    registered separately because it is fully SQL-expressible, so it
    hash-pins the iterative learner's round-0 statistics against the
    DuckDB oracle (the loop itself is rows-only; see ``bpe_merge_learn``).

    Scale shape: corpus scan -> word-type agg (sublinear table) ->
    per-type char explode (bounded by word length) -> pair agg ->
    TakeOrdered top-N. One corpus pass total.
    """
    words = word_type_table(table(spark, sf_dir, "documents"))
    syms = words.select(F.col("n"), F.split("word", "").alias("s"))
    return (
        _pair_counts(syms)
        .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
        .limit(FIRST_PAIRS_TOP_N)
    )


def _apply_merge(left: str, right: str, merged: str):
    """Arrow-batched greedy left-to-right pair merge over symbol arrays —
    the classic BPE rewrite (non-overlapping, leftmost-first)."""

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for s in pdf["s"]:
                s = list(s)
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"n": pdf["n"], "s": out})

    return mapper


def bpe_learn(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns one row per merge:
    (merge_rank, left_sym, right_sym, merged_sym, pair_count).

    Ties in pair frequency break by (left_sym, right_sym) lexicographic
    order — deterministic across engines, partitionings, and reruns.

    Per-round cost: one pair aggregation over the vocab table, a 1-row
    TakeOrdered argmax, and an Arrow rewrite of ONLY the word types
    containing the winning pair (JVM `exists` predicate splits the
    table; untouched types ride along unmodified).  ``localCheckpoint``
    truncates lineage each round so plan depth stays constant over
    thousands of merges.
    """
    spark = docs.sparkSession
    syms = (
        word_type_table(docs)
        .select(F.col("n"), F.split("word", "").alias("s"))
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(syms)
            .orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merged = b.left_sym + b.right_sym
        merges.append((rank, b.left_sym, b.right_sym, merged, b.pair_count))
        # size guard first: sequence(1, 0) would yield a DESCENDING [1, 0]
        # on single-symbol words and trip element_at's index-0 error.
        has_pair = F.expr(
            "size(s) >= 2 AND exists(sequence(1, size(s) - 1), "
            f"i -> element_at(s, i) = '{b.left_sym}' AND "
            f"element_at(s, i + 1) = '{b.right_sym}')"
        )
        affected = syms.filter(has_pair)
        rewritten = affected.mapInPandas(
            _apply_merge(b.left_sym, b.right_sym, merged),
            schema="n long, s array<string>",
        )
        syms = syms.filter(~has_pair).unionByName(rewritten).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged_sym string, pair_count long",
    )


@register(
    "bpe_merge_learn",
    oracle=None,  # iterative argmax loop: not single-statement-SQL-expressible;
    # round-0 statistics are hash-pinned by bpe_first_pairs and the merge
    # sequence by the textbook-corpus unit test (tests/test_llm_ops.py)
    doc=f"BPE tokenizer training: the first {BPE_MERGES} learned merges "
    "(rank, pair, merged symbol, support) via the distributed "
    "word-type pair-count loop.",
)
def bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_learn(table(spark, sf_dir, "documents"))

"""Input-size guards for the deliberately quadratic oracle tiers.

Two registered queries (``ngram_jaccard_pairs``, ``embedding_cosine_pairs``)
are *exact all-pairs* computations on a mod-sampled subset: they exist as
ground truth for the LSH/ANN scale paths, and their theta-joins
(``a.id < b.id``) compile to a BroadcastNestedLoopJoin — O(n²) by design.
That is safe only while the input stays sample-sized; anyone lifting the
sample filter would silently get a quadratic job.  These guards make that
failure loud: the builder counts the (sampled) input — a cheap
single-column scan — and refuses to construct the plan past a constant
bound, mirroring the hard query caps in ``similarity.knn_bruteforce``
(KNN_MAX_QUERIES_TOTAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: All-pairs on 25k rows is ~312M comparisons — the most a ground-truth
#: tier should ever cost.  Beyond this the LSH/ANN path is the only answer.
MAX_QUADRATIC_INPUT_ROWS = 25_000


def assert_bounded_input(
    df: DataFrame, what: str, bound: int = MAX_QUADRATIC_INPUT_ROWS
) -> DataFrame:
    """Fail loudly if a quadratic-tier input outgrew its sample bound."""
    n = df.count()
    if n > bound:
        raise ValueError(
            f"{what}: input has {n} rows, above the all-pairs bound {bound}. "
            "This operator is an intentionally quadratic ground-truth tier "
            "over a mod-sampled subset; for full-corpus near-dup/similarity "
            "use the MinHash-LSH / ANN scale paths instead."
        )
    return df

"""ANN recall floors at BOTH sf0.01 and sf0.1 (r9 VERDICT ask #6).

The five ANN queries are terminal rows-only (no DuckDB oracle can replay
NumPy RNG / float k-means), so recall-vs-exact-kNN floors are their only
quantitative check — and repo experience says sf0.1 exposes assumptions
sf0.01 hides.  All pipelines are seeded-deterministic, so recall at a
fixed SF is a constant; floors sit just under the measured values.

r11 (r10 VERDICT ask #4): the fixed-budget variants now scale their
search effort with the corpus — nprobe ~ 2.5*sqrt(n_centroids)
(similarity._ivf_nprobe), PQ codewords ~ sqrt(corpus) capped at byte
codes (similarity._pq_codewords), ADC shortlist factor 8 (12 and 1.5x
nprobe for IVF-PQ, which compounds two approximations).  Measured
recall@5 moved: ivf 0.45 -> 0.75, pq 0.33 -> 0.73, ivfpq 0.28 -> 0.74
at sf0.1 (2000 vectors); every variant now clears 0.6 at both SFs.
"""

from __future__ import annotations

import pytest

from azure_func_forem_data_etl_spark.sources.tables import table

SF001 = "/root/testdata/sf0.01"
SF01 = "/root/testdata/sf0.1"

# (variant, floor at sf0.01, floor at sf0.1) — measured values r11:
# lsh 1.00/1.00, ivf 0.92/0.75, pq 0.76/0.73, ivfpq 0.80/0.74,
# trained-ivf 0.80/0.89
_FLOORS = {
    "lsh": (0.9, 0.9),
    "ivf": (0.85, 0.7),
    "pq": (0.7, 0.65),
    "ivfpq": (0.7, 0.65),
    "ivf_trained": (0.7, 0.8),
}


def _approx_pairs(spark, sf, variant):
    from azure_func_forem_data_etl_spark.operators.similarity import (
        ivf_topk,
        ivfpq_topk,
        lsh_topk,
        pq_topk,
    )

    emb = table(spark, sf, "embeddings")
    if variant == "ivf_trained":
        import numpy as np

        from azure_func_forem_data_etl_spark.operators.clustering import kmeans_fit

        C, _ = kmeans_fit(emb)
        df = ivf_topk(emb, centroids=(np.arange(C.shape[0]), C))
    else:
        df = {"lsh": lsh_topk, "ivf": ivf_topk, "pq": pq_topk, "ivfpq": ivfpq_topk}[
            variant
        ](emb)
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_by_sf(spark):
    from azure_func_forem_data_etl_spark.plans.registry import load_all

    knn = load_all()["knn_bruteforce"]
    return {
        sf: {(r.query_id, r.neighbor_id) for r in knn.fn(spark, sf).collect()}
        for sf in (SF001, SF01)
    }


@pytest.mark.parametrize("variant", sorted(_FLOORS))
@pytest.mark.parametrize("sf", [SF001, SF01], ids=["sf0.01", "sf0.1"])
def test_ann_recall_floor_both_sfs(spark, exact_by_sf, variant, sf):
    exact = exact_by_sf[sf]
    approx = _approx_pairs(spark, sf, variant)
    recall = len(exact & approx) / len(exact)
    floor = _FLOORS[variant][0 if sf == SF001 else 1]
    assert recall >= floor, f"{variant} recall@5 {recall:.3f} < {floor} at {sf}"

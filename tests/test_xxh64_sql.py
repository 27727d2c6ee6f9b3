"""Property tests for the DuckDB xxhash64 replay (functions/xxh64_sql.py):
the Python reference must be bit-exact vs Spark's F.xxhash64, and the
generated SQL must be bit-exact vs the reference — together they certify
the near-dup oracles' hash arithmetic on data OTHER than the fixtures."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from azure_func_forem_data_etl_spark.functions import xxh64_sql as X


#: 1-to-4-byte UTF-8 alphabet for the multibyte legs: the SQL replay reads
#: true bytes via hex(encode(s)) nibble pairs (r11), so char length and
#: byte length must be allowed to diverge in every geometry branch
#: (stripes / words / 4-byte word / tail bytes).
_MB_ALPHABET = "aé€\U0001F600øñш中"


def _rand_strs(seed: int, n: int, max_len: int = 150) -> list[str]:
    rng = random.Random(seed)
    # edge shapes first: empty, tail-only, exact/straddling stripe bounds —
    # in ASCII and in multibyte UTF-8 (é = 2 bytes: 16 chars = 32 bytes)
    fixed = ["", "a", "abc", "abcdefg", "abcdefgh", "x" * 31, "x" * 32,
             "x" * 33, "y" * 63, "y" * 64, "z" * 100,
             "é", "€", "\U0001F600", "é" * 15, "é" * 16, "é" * 17,
             "aé€\U0001F600" * 7, "中" * 21]
    return fixed + [
        "".join(rng.choice(string.printable[:95]) for _ in range(rng.randint(1, max_len)))
        for _ in range(n)
    ] + [
        "".join(rng.choice(_MB_ALPHABET) for _ in range(rng.randint(1, 60)))
        for _ in range(n // 2)
    ]


@pytest.mark.parametrize("seed", [0, 1])
def test_python_reference_matches_spark(spark, seed):
    """xxh64_bytes/int/long + seed chaining == F.xxhash64 bit-for-bit."""
    from pyspark.sql import functions as F

    rng = random.Random(seed)
    strs = _rand_strs(seed, 80)
    rows = [
        (i, s, rng.randint(-(2**31), 2**31 - 1), rng.randint(-(2**63), 2**63 - 1))
        for i, s in enumerate(strs)
    ]
    df = spark.createDataFrame(rows, "id int, s string, i int, l long")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            F.xxhash64("s").alias("hs"),
            F.xxhash64("i").alias("hi"),
            F.xxhash64("l").alias("hl"),
            F.xxhash64("i", "s").alias("his"),
            F.xxhash64("l", "l").alias("hll"),
        ).collect()
    }
    for i, s, iv, lv in rows:
        b = s.encode()
        assert got[i]["hs"] == X.to_signed(X.xxh64_bytes(b, 42))
        assert got[i]["hi"] == X.to_signed(X.xxh64_int(iv, 42))
        assert got[i]["hl"] == X.to_signed(X.xxh64_long(lv, 42))
        assert got[i]["his"] == X.to_signed(X.xxh64_bytes(b, X.xxh64_int(iv, 42)))
        assert got[i]["hll"] == X.to_signed(X.xxh64_long(lv, X.xxh64_long(lv, 42)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sql_string_hash_matches_reference(seed):
    """The generated CTE chain == xxh64_bytes for random printable strings
    under multiple chained seeds (the MinHash permutation layout)."""
    strs = _rand_strs(seed, 120)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strs)))
    seeds = [(i, X.xxh64_int(i, X.SPARK_HASH_SEED)) for i in range(3)] + [(99, 42)]
    ctes = X.xxh64_str_ctes("xh", "t", ["id"], "s", seeds)
    rows = con.execute(
        f"WITH RECURSIVE {ctes} SELECT seed_id, id, {X.signed64('h')} FROM xh_hash"
    ).fetchall()
    assert len(rows) == len(strs) * len(seeds)
    lut = dict(seeds)
    for sid, i, h in rows:
        assert h == X.to_signed(X.xxh64_bytes(strs[i].encode(), lut[sid])), (
            f"seed={sid} id={i} len={len(strs[i])}"
        )


def test_sql_chained_longs_match_reference():
    """xxh64_longs_expr_ctes == chained xxh64_long (the band-hash layout)."""
    rng = random.Random(5)
    rows = [
        tuple([i] + [rng.randint(-(2**63), 2**63 - 1) for _ in range(4)])
        for i in range(300)
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id INT, a BIGINT, b BIGINT, c BIGINT, d BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
    ctes = X.xxh64_longs_expr_ctes("bh", "t", ["id"], ["a", "b", "c", "d"], 42)
    got = dict(con.execute(f"WITH {ctes} SELECT id, {X.signed64('h')} FROM bh_hash").fetchall())
    for i, a, b, c, d in rows:
        h = 42
        for v in (a, b, c, d):
            h = X.xxh64_long(v, h)
        assert got[i] == X.to_signed(h)

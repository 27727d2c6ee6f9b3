"""Bit-exact DuckDB replay of Spark's ``xxhash64`` — the bridge that turns
the "engine-hash-bound" rows-only queries (MinHash-LSH, SimHash) into full
DuckDB-oracle hash-matches.

Spark's ``F.xxhash64(*cols)`` is the XXH64 algorithm (seed 42) applied
per-column with seed chaining: ``h = hash(col_n, hash(col_{n-1}, ... 42))``,
where ints take the 4-byte path, longs the 8-byte path, and strings hash
their UTF-8 bytes (reference: spark/sql/catalyst XXH64.java — public
algorithm, public constants).  DuckDB 1.0 has no xxhash64, but it has
HUGEINT (int128): every unsigned-64 operation is expressible exactly —

- ``mul``: split one factor at 2^32 so partial products stay < 2^97,
- ``rotl``/shifts: integer div/mod by powers of two,
- ``xor``: DuckDB's ``xor()`` works on HUGEINT natively.

The generators below emit CTE chains (plain SQL text, one statement) that
compute the hash VECTORIZED across all rows: variable-length loops (32-byte
stripes, 8-byte words) become recursive CTEs advancing every row one step
per iteration; the bounded tail (one 4-byte word, <=3 bytes, fmix) unrolls
into successive CTE columns.  Byte extraction is TRUE UTF-8: the base CTE
hex-encodes the text once (``lower(hex(encode(s)))``) and every byte is a
nibble pair of that hex string, with ``octet_length(encode(s))`` as the
length — byte-exact on any text, not just ASCII (r11; the same extractor
proven in operators/multimodal.py's byte replays, r10).

The pure-Python reference (``xxh64_*`` functions) is property-tested
bit-exact against both Spark and the generated SQL in
tests/test_xxh64_sql.py.
"""

from __future__ import annotations

U64 = 1 << 64
M64 = U64 - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


# ---------------------------------------------------------------------------
# Pure-Python reference (bit-exact vs Spark; also computes seed constants)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def xxh64_int(i: int, seed: int) -> int:
    """Spark XXH64.hashInt (IntegerType column), unsigned result."""
    h = (seed + P5 + 4) & M64
    h ^= ((i & 0xFFFFFFFF) * P1) & M64
    h = (_rotl(h, 23) * P2 + P3) & M64
    return _fmix(h)


def xxh64_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong (LongType column), unsigned result."""
    h = (seed + P5 + 8) & M64
    h ^= (_rotl((v & M64) * P2 & M64, 31) * P1) & M64
    h = (_rotl(h, 27) * P1 + P4) & M64
    return _fmix(h)


def xxh64_bytes(b: bytes, seed: int) -> int:
    """Spark XXH64.hashUnsafeBytes (StringType column), unsigned result."""
    n = len(b)
    off = 0
    if n >= 32:
        vs = [
            (seed + P1 + P2) & M64,
            (seed + P2) & M64,
            seed & M64,
            (seed - P1) & M64,
        ]
        while off <= n - 32:
            for i in range(4):
                w = int.from_bytes(b[off + 8 * i : off + 8 * i + 8], "little")
                vs[i] = (_rotl((vs[i] + w * P2) & M64, 31) * P1) & M64
            off += 32
        h = (
            _rotl(vs[0], 1) + _rotl(vs[1], 7) + _rotl(vs[2], 12) + _rotl(vs[3], 18)
        ) & M64
        for v in vs:
            g = (_rotl((v * P2) & M64, 31) * P1) & M64
            h = ((h ^ g) * P1 + P4) & M64
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while off <= n - 8:
        w = int.from_bytes(b[off : off + 8], "little")
        h ^= (_rotl((w * P2) & M64, 31) * P1) & M64
        h = (_rotl(h, 27) * P1 + P4) & M64
        off += 8
    if off <= n - 4:
        w = int.from_bytes(b[off : off + 4], "little")
        h ^= (w * P1) & M64
        h = (_rotl(h, 23) * P2 + P3) & M64
        off += 4
    while off < n:
        h ^= (b[off] * P5) & M64
        h = (_rotl(h, 11) * P1) & M64
        off += 1
    return _fmix(h)


def to_signed(x: int) -> int:
    x &= M64
    return x - U64 if x >= (1 << 63) else x


# ---------------------------------------------------------------------------
# SQL text primitives: every value is a HUGEINT in [0, 2^64)


def _c(v: int) -> str:
    """HUGEINT literal."""
    return f"CAST({v} AS HUGEINT)"


def s_mul(a: str, b: str) -> str:
    """(a*b) mod 2^64; ``a``/``b`` should be constants or plain columns
    (each is duplicated), partial products stay < 2^97 << 2^127.  All
    power-of-two reductions are SHIFTS/MASKS — int128 division/modulo is
    software-emulated in DuckDB and ~10x slower than bitwise ops (the
    difference between a 40 s and a 4 s oracle at 500k hash rows)."""
    m32 = _c((1 << 32) - 1)
    hi = f"((((({a}) >> 32) * ({b})) & {m32}) << 32)"
    lo = f"((({a}) & {m32}) * ({b}))"
    return f"((({hi} + {lo})) & {_c(M64)})"


def s_add(a: str, b: str) -> str:
    return f"((({a}) + ({b})) & {_c(M64)})"


def s_rotl(x: str, r: int) -> str:
    return (
        f"(((({x}) & {_c((1 << (64 - r)) - 1)}) << {r}) + (({x}) >> {64 - r}))"
    )


def s_shr(x: str, n: int) -> str:
    return f"(({x}) >> {n})"


def s_xor(a: str, b: str) -> str:
    return f"xor(CAST({a} AS HUGEINT), CAST({b} AS HUGEINT))"


def s_word_step(h: str, w: str) -> str:
    """One 8-byte-word round: h = rotl(h ^ (rotl(w*P2,31)*P1), 27)*P1 + P4."""
    g = s_mul(s_rotl(s_mul(w, _c(P2)), 31), _c(P1))
    return s_add(s_mul(s_rotl(s_xor(h, g), 27), _c(P1)), _c(P4))


def s_lane_step(v: str, w: str) -> str:
    """One stripe-lane round: v = rotl(v + w*P2, 31) * P1."""
    return s_mul(s_rotl(s_add(v, s_mul(w, _c(P2))), 31), _c(P1))


_HEXDIGITS = "0123456789abcdef"


def s_byte(hx: str, i0: str) -> str:
    """True UTF-8 byte (HUGEINT) at 0-based BYTE index ``i0`` of the
    hex-encoded column ``hx`` (= ``lower(hex(encode(text)))``): the byte is
    its two nibbles, each located by ``strpos`` over the hex alphabet.
    Out-of-range access yields a garbage value (never an error —
    ``substring`` past the end returns '' and ``strpos`` 0), so callers
    must guard range like the previous ``ascii(substr)`` form did."""
    hi = f"(strpos('{_HEXDIGITS}', substring({hx}, CAST(2 * ({i0}) + 1 AS BIGINT), 1)) - 1)"
    lo = f"(strpos('{_HEXDIGITS}', substring({hx}, CAST(2 * ({i0}) + 2 AS BIGINT), 1)) - 1)"
    return f"CAST({hi} * 16 + {lo} AS HUGEINT)"


def _word_expr(hx: str, start0: str) -> str:
    """Little-endian 8-byte word from hex column ``hx`` at 0-based byte
    index ``start0``."""
    terms = [
        f"{s_byte(hx, f'({start0}) + {j}')} * {_c(1 << (8 * j))}"
        for j in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def xxh64_str_ctes(
    prefix: str,
    src: str,
    key_cols: list[str],
    text_col: str,
    seeds: list[tuple[int, int]],
) -> str:
    """CTE chain hashing ``src.text_col`` (ASCII) under each (seed_id, seed).

    Emits CTEs ``{prefix}_base .. {prefix}_hash``; the final CTE has columns
    ``key_cols..., seed_id, h`` (h = unsigned u64 HUGEINT).  Embed inside a
    ``WITH RECURSIVE`` statement, comma-joined with the caller's CTEs.

    Layout mirrors XXH64 exactly: nstripes 32-byte stripes (4 lanes, fold
    via recursive CTE 4 words/step), remaining 8-byte words (recursive CTE
    1 word/step), then one optional 4-byte word, <=3 tail bytes and the
    fmix avalanche as unrolled CTE columns.
    """
    keys = ", ".join(key_cols)
    seed_rows = ", ".join(f"({sid}, {_c(sv)})" for sid, sv in seeds)
    # --- base geometry -----------------------------------------------------
    # nst = stripe count, nw = total 8-byte words, wst = words consumed by
    # stripes; Phase B consumes words wst..nw-1; tail starts at byte 8*nw.
    # base/words are MATERIALIZED: both are joined from RECURSIVE terms,
    # and DuckDB inlines plain CTEs — the source relation (often an
    # expensive shingle/gram expansion) would re-run once per fold
    # iteration per reference (measured 110 s -> 7 s on the bloom audit).
    base = f"""
    {prefix}_base AS MATERIALIZED (
        -- encode+hex run ONCE per row via lateral alias refs (DuckDB
        -- does not CSE repeated encode() calls); n = byte length
        SELECT {keys}, lower(hex(encode({text_col}))) AS hx,
               length(hx) // 2 AS n,
               CASE WHEN n >= 32 THEN n // 32 ELSE 0 END AS nst,
               n // 8 AS nw
        FROM {src}
    ),
    {prefix}_seeds(seed_id, seed) AS (VALUES {seed_rows}),
    {prefix}_words AS MATERIALIZED (
        SELECT {keys}, t.wi, {_word_expr('b.hx', 't.wi * 8')} AS w
        FROM {prefix}_base b,
             UNNEST(generate_series(0, b.nw - 1)) AS t(wi)
        WHERE b.nw > 0
    )"""
    # --- phase A: 32-byte stripes (4 lanes), recursive over stripe index ---
    lane_inits = {
        1: f"(seed + {_c((P1 + P2) & M64)}) & {_c(M64)}",
        2: f"(seed + {_c(P2)}) & {_c(M64)}",
        3: "seed",
        4: f"(seed + {_c((U64 - P1) & M64)}) & {_c(M64)}",
    }
    # Textual step nesting beats LATERAL-named intermediates here: with
    # shift/mask primitives each re-evaluated subexpression is a couple of
    # int128 ops, cheaper than a LATERAL join per step (measured 9.2 s vs
    # 10.6 s for 520k hashes).
    lane_steps = ", ".join(
        s_lane_step(f"r.v{i}", f"w{i - 1}.w") + f" AS v{i}" for i in range(1, 5)
    )
    word_joins = "\n            ".join(
        f"JOIN {prefix}_words w{j} ON ({' AND '.join(f'w{j}.{k} = r.{k}' for k in key_cols)})"
        f" AND w{j}.wi = r.si * 4 + {j}"
        for j in range(4)
    )
    stripe = f"""
    {prefix}_stripes(seed_id, {keys}, si, v1, v2, v3, v4) AS (
        SELECT s.seed_id, {', '.join('b.' + k for k in key_cols)}, 0,
               {lane_inits[1]}, {lane_inits[2]}, {lane_inits[3]}, {lane_inits[4]}
        FROM {prefix}_base b CROSS JOIN {prefix}_seeds s
        WHERE b.nst > 0
        UNION ALL
        SELECT r.seed_id, {', '.join('r.' + k for k in key_cols)}, r.si + 1, {lane_steps}
        FROM {prefix}_stripes r
            {word_joins}
            JOIN {prefix}_base b ON ({' AND '.join(f'b.{k} = r.{k}' for k in key_cols)})
        WHERE r.si < b.nst
    )"""
    # --- merge lanes (long strings) / trivial init (short strings) ---------
    h0 = s_add(
        s_add(s_rotl("v1", 1), s_rotl("v2", 7)),
        s_add(s_rotl("v3", 12), s_rotl("v4", 18)),
    )
    merge_rounds = []
    for i in range(1, 5):
        g = s_mul(s_rotl(s_mul(f"v{i}", _c(P2)), 31), _c(P1))
        merge_rounds.append(
            f""",
    {prefix}_m{i} AS (
        SELECT seed_id, {keys}, v1, v2, v3, v4,
               {s_add(s_mul(s_xor('h', g), _c(P1)), _c(P4))} AS h
        FROM {prefix}_m{i - 1}
    )"""
        )
    merged = f"""
    {prefix}_m0 AS (
        SELECT r.seed_id, {', '.join('r.' + k for k in key_cols)},
               r.v1, r.v2, r.v3, r.v4, {h0} AS h
        FROM {prefix}_stripes r
            JOIN {prefix}_base b ON ({' AND '.join(f'b.{k} = r.{k}' for k in key_cols)})
        WHERE r.si = b.nst AND b.nst > 0
    ){''.join(merge_rounds)},
    {prefix}_init AS (
        SELECT m.seed_id, {', '.join('m.' + k for k in key_cols)},
               {s_add('m.h', 'b.n')} AS h, b.nst * 4 AS wi
        FROM {prefix}_m4 m
            JOIN {prefix}_base b ON ({' AND '.join(f'b.{k} = m.{k}' for k in key_cols)})
        UNION ALL
        SELECT s.seed_id, {', '.join('b.' + k for k in key_cols)},
               {s_add(s_add('s.seed', _c(P5)), 'b.n')} AS h, 0 AS wi
        FROM {prefix}_base b CROSS JOIN {prefix}_seeds s
        WHERE b.nst = 0
    )"""
    # --- phase B: remaining 8-byte words, recursive -------------------------
    word_loop = f"""
    {prefix}_wfold(seed_id, {keys}, wi, h) AS (
        SELECT seed_id, {keys}, wi, h FROM {prefix}_init
        UNION ALL
        SELECT r.seed_id, {', '.join('r.' + k for k in key_cols)}, r.wi + 1,
               {s_word_step('r.h', 'w.w')}
        FROM {prefix}_wfold r
            JOIN {prefix}_words w
              ON ({' AND '.join(f'w.{k} = r.{k}' for k in key_cols)}) AND w.wi = r.wi
            JOIN {prefix}_base b ON ({' AND '.join(f'b.{k} = r.{k}' for k in key_cols)})
        WHERE r.wi < b.nw
    )"""
    # --- tail: optional 4-byte word, then <=3 bytes, then fmix -------------
    # Tail byte values depend only on the KEY (not the seed): computed once
    # per key in _tailgeo, then joined into the per-(key, seed) fold.
    w4_terms = " + ".join(
        f"{s_byte('hx', f'nw * 8 + {j}')} * {_c(1 << (8 * j))}"
        for j in range(4)
    )
    tb_cols = ", ".join(
        f"CASE WHEN (n % 4) > {k} THEN "
        f"{s_byte('hx', f'n - (n % 4) + {k}')} "
        f"ELSE {_c(0)} END AS tb{k}"
        for k in range(3)
    )
    tailgeo = f"""
    {prefix}_tailgeo AS (
        SELECT {keys}, n,
               CASE WHEN (n % 8) >= 4 THEN {w4_terms} ELSE {_c(0)} END AS k4,
               {tb_cols}
        FROM {prefix}_base
    )"""
    carry = f"seed_id, {keys}, n, tb0, tb1, tb2"
    t4_step = s_add(
        s_mul(s_rotl(s_xor("f.h", s_mul("g.k4", _c(P1))), 23), _c(P2)), _c(P3)
    )
    t4 = f"""
    {prefix}_t4 AS (
        SELECT f.seed_id, {', '.join('f.' + k for k in key_cols)},
               g.n, g.tb0, g.tb1, g.tb2,
               CASE WHEN (g.n % 8) >= 4 THEN {t4_step}
                    ELSE f.h END AS h
        FROM {prefix}_wfold f
            JOIN {prefix}_base b ON ({' AND '.join(f'b.{k} = f.{k}' for k in key_cols)})
            JOIN {prefix}_tailgeo g ON ({' AND '.join(f'g.{k} = f.{k}' for k in key_cols)})
        WHERE f.wi = b.nw
    )"""
    byte_ctes = []
    for k in range(3):
        src_cte = f"{prefix}_t4" if k == 0 else f"{prefix}_b{k - 1}"
        step = s_mul(s_rotl(s_xor("h", s_mul(f"tb{k}", _c(P5))), 11), _c(P1))
        byte_ctes.append(
            f""",
    {prefix}_b{k} AS (
        SELECT {carry},
               CASE WHEN (n % 4) > {k} THEN {step} ELSE h END AS h
        FROM {src_cte}
    )"""
        )
    fmix_steps = [
        ("f1", s_xor("h", s_shr("h", 33))),
        ("f2", s_mul("h", _c(P2))),
        ("f3", s_xor("h", s_shr("h", 29))),
        ("f4", s_mul("h", _c(P3))),
        ("f5", s_xor("h", s_shr("h", 32))),
    ]
    fmix_ctes = []
    prev = f"{prefix}_b2"
    for name, expr in fmix_steps:
        fmix_ctes.append(
            f""",
    {prefix}_{name} AS (
        SELECT seed_id, {keys}, {expr} AS h FROM {prev}
    )"""
        )
        prev = f"{prefix}_{name}"
    tail = f"""{tailgeo},
    {t4}{''.join(byte_ctes)}{''.join(fmix_ctes)},
    {prefix}_hash AS (
        SELECT seed_id, {keys}, h FROM {prefix}_f5
    )"""
    return ",\n".join([base, stripe, merged, word_loop, tail])


def xxh64_longs_expr_ctes(
    prefix: str, src: str, out_cols: list[str], long_cols: list[str], seed: int
) -> str:
    """CTE chain for ``xxhash64(long_col_1, ..., long_col_k)`` (seed-chained
    hashLong over SIGNED BIGINT columns of ``src``).  Final CTE
    ``{prefix}_hash`` has ``out_cols..., h`` (unsigned u64 HUGEINT)."""
    ctes = [
        f"""
    {prefix}_l0 AS (
        SELECT {', '.join(out_cols)},
               {', '.join(f'(CAST({c} AS HUGEINT) + {_c(U64)}) & {_c(M64)} AS u_{i}' for i, c in enumerate(long_cols))},
               {_c(seed & M64)} AS h
        FROM {src}
    )"""
    ]
    prev = f"{prefix}_l0"
    n_u = len(long_cols)
    for i in range(n_u):
        # hashLong: h0 = seed + P5 + 8; h0 ^= rotl(u*P2,31)*P1;
        # h0 = rotl(h0,27)*P1 + P4; fmix — unrolled via chained CTEs.
        g = s_mul(s_rotl(s_mul(f"u_{i}", _c(P2)), 31), _c(P1))
        step1 = s_xor(s_add("h", _c((P5 + 8) & M64)), g)
        step2 = s_add(s_mul(s_rotl("h", 27), _c(P1)), _c(P4))
        carry = ", ".join(f"u_{j}" for j in range(n_u))
        ctes.append(
            f"""
    {prefix}_l{i}a AS (
        SELECT {', '.join(out_cols)}, {carry}, {step1} AS h FROM {prev}
    ),
    {prefix}_l{i}b AS (
        SELECT {', '.join(out_cols)}, {carry}, {step2} AS h FROM {prefix}_l{i}a
    ),
    {prefix}_l{i}c AS (
        SELECT {', '.join(out_cols)}, {carry}, {s_xor('h', s_shr('h', 33))} AS h FROM {prefix}_l{i}b
    ),
    {prefix}_l{i}d AS (
        SELECT {', '.join(out_cols)}, {carry}, {s_mul('h', _c(P2))} AS h FROM {prefix}_l{i}c
    ),
    {prefix}_l{i}e AS (
        SELECT {', '.join(out_cols)}, {carry}, {s_xor('h', s_shr('h', 29))} AS h FROM {prefix}_l{i}d
    ),
    {prefix}_l{i}f AS (
        SELECT {', '.join(out_cols)}, {carry}, {s_mul('h', _c(P3))} AS h FROM {prefix}_l{i}e
    ),
    {prefix}_l{i}g AS (
        SELECT {', '.join(out_cols)}, {carry}, {s_xor('h', s_shr('h', 32))} AS h FROM {prefix}_l{i}f
    )"""
        )
        prev = f"{prefix}_l{i}g"
    ctes.append(
        f"""
    {prefix}_hash AS (
        SELECT {', '.join(out_cols)}, h FROM {prev}
    )"""
    )
    return ",\n".join(ctes)


SIGNED64_SQL = (
    "CASE WHEN {h} >= CAST(9223372036854775808 AS HUGEINT) "
    f"THEN CAST({{h}} - {_c(U64)} AS BIGINT) ELSE CAST({{h}} AS BIGINT) END"
)


def signed64(h: str) -> str:
    """u64 HUGEINT -> the BIGINT Spark reports (two's complement)."""
    return SIGNED64_SQL.format(h=h)


def xxh64_int_col_ctes(
    prefix: str, src: str, carry_cols: list[str], i_col: str, seed_col: str
) -> str:
    """CTE chain for ``hashInt(i_col, seed_col)`` where BOTH are columns of
    ``src`` (the multi-column layout ``xxhash64(str_col, int_lit)`` needs:
    the string hash becomes the seed of the int hash).  ``seed_col`` must
    be u64 HUGEINT; ``i_col`` a non-negative INT.  Final CTE
    ``{prefix}_hash`` has ``carry_cols..., h``."""
    carry = ", ".join(carry_cols)
    g = s_mul(f"CAST({i_col} AS HUGEINT)", _c(P1))
    steps = [
        ("i0", s_add(seed_col, _c((P5 + 4) & M64)), src),
        ("i1", s_xor("h", g), None),
        ("i2", s_add(s_mul(s_rotl("h", 23), _c(P2)), _c(P3)), None),
        ("i3", s_xor("h", s_shr("h", 33)), None),
        ("i4", s_mul("h", _c(P2)), None),
        ("i5", s_xor("h", s_shr("h", 29)), None),
        ("i6", s_mul("h", _c(P3)), None),
        ("i7", s_xor("h", s_shr("h", 32)), None),
    ]
    ctes = []
    prev = src
    for name, expr, _ in steps:
        # i_col must ride along until consumed (i1); carry it throughout
        ctes.append(
            f"""
    {prefix}_{name} AS (
        SELECT {carry}, {i_col}, {expr} AS h FROM {prev}
    )"""
        )
        prev = f"{prefix}_{name}"
    ctes.append(
        f"""
    {prefix}_hash AS (
        SELECT {carry}, {i_col}, h FROM {prev}
    )"""
    )
    return ",\n".join(ctes)

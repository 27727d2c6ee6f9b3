"""Random fixture generator: same schemas/alphabets as the driver's
synthetic tables (TESTDATA.md), different seed and different shapes.

Powers the registry-wide oracle-on-random-data sweep: every oracle-backed
query must hash-match its DuckDB twin on data it has never seen, closing
the "works only on the fixture" gap for the whole registry (the fixtures
are seed-42; any seed here but 42 exercises new shapes).
"""

from __future__ import annotations

import datetime as dt
import json
import random
import zlib
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

_T0 = dt.datetime(2024, 1, 1)
_WORDS = (
    "the a key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer line "
    "value agg column big fast vector"
).split()
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ETYPES = ["view", "click", "purchase", "signup", "error"]
_LANGS = ["en", "es", "de", "fr", "zh"]

#: Extreme-timestamp eras (r11 sweep leg): deep pre-epoch (negative epoch
#: micros), the 1970 epoch straddle, both US DST transitions, far future
#: past 2100.  Each era spans ~3 days and is keyed by event_type (and by
#: o_orderkey for orders), so per-series hourly gap-fill spines stay
#: bounded while the table as a whole spans 1965..2105.
_TS_ERAS = [
    (dt.datetime(1965, 6, 1), 3),
    (dt.datetime(1969, 12, 30), 3),
    (dt.datetime(2024, 3, 9), 3),
    (dt.datetime(2024, 11, 2), 3),
    (dt.datetime(2105, 1, 1), 3),
]


def _tbl(
    path: Path,
    name: str,
    cols: dict,
    types: dict,
    layout_files: int = 0,
    layout_seed: int = 0,
) -> None:
    """``layout_files`` > 1 writes the table as a DIRECTORY of that many
    part files with the rows SHUFFLED across them — the physical layout
    of any real multi-executor dataset (thousands of files, no global
    row order).  Results must be invariant to it; both readers handle
    the directory form (Spark natively, the oracle via its glob branch)."""
    arrays = {c: pa.array(v, type=types[c]) for c, v in cols.items()}
    t = pa.table(arrays)
    if layout_files <= 1:
        pq.write_table(t, str(path / f"{name}.parquet"))
        return
    idx = list(range(t.num_rows))
    # zlib.crc32, not hash(): str hash is salted per process and the
    # fixture must be byte-reproducible from its seed
    random.Random(layout_seed ^ zlib.crc32(name.encode())).shuffle(idx)
    d = path / f"{name}.parquet"
    d.mkdir(parents=True, exist_ok=True)
    k = min(layout_files, max(1, t.num_rows))
    per = (len(idx) + k - 1) // k
    for i in range(k):
        chunk = idx[i * per : (i + 1) * per]
        if not chunk:
            continue
        pq.write_table(
            t.take(pa.array(chunk, type=pa.int64())),
            str(d / f"part-{i:03d}.parquet"),
        )


def write_random_fixture(
    dirpath: str | Path,
    seed: int,
    n_customers: int = 120,
    n_suppliers: int = 9,
    n_parts: int = 160,
    n_orders: int = 1100,
    n_events: int = 900,
    n_docs: int = 400,
    n_vecs: int = 400,
    emb_dim: int = 64,
    span_days: int = 30,
    ts_grain_s: int = 0,
    hot_frac: float = 0.0,
    null_frac: float = 0.0,
    const_values: bool = False,
    zero_vec_every: int = 0,
    single_label: bool = False,
    ts_eras: bool | str = False,
    magnitude_spread: bool = False,
    long_docs: int = 0,
    dup_event_frac: float = 0.0,
    emb_magnitude_spread: bool = False,
    id_offset: int = 0,
    null_fk_frac: float = 0.0,
    null_val_frac: float = 0.0,
    null_text_frac: float = 0.0,
    null_etype_frac: float = 0.0,
    null_label_frac: float = 0.0,
    unicode_docs: int = 0,
    casefold_docs: int = 0,
    wsp_docs: int = 0,
    layout_files: int = 0,
    orphan_fk_frac: float = 0.0,
    emb_specials: bool = False,
    dup_doc_frac: float = 0.0,
    dup_vec_frac: float = 0.0,
) -> str:
    """``ts_grain_s`` > 0 truncates event timestamps to that many seconds
    (and drops the microsecond part), manufacturing heavy timestamp TIES —
    the regime where ordering/tie-break divergences hide.  ``hot_frac``
    > 0 routes that fraction of events/lineitems/docs to ONE hot
    user/part/lang — the skew regime.  ``null_frac`` > 0 NULLs that
    fraction of event props and blanks that fraction of document texts —
    shapes the driver fixtures never produce.  ``const_values`` pins
    every money/value column to one constant — maximal ordering ties, the
    regime where every rank/top-k tie-break earns its keep.
    ``zero_vec_every`` > 0 zeroes every Nth embedding (cosine-undefined
    inputs) and ``single_label`` collapses labels to one class (AUC/KS
    undefined) — the degenerate-embedding regime.  ``ts_eras`` scatters
    event/order timestamps across ``_TS_ERAS`` (pre-1970 negative-epoch
    micros, the epoch straddle, DST-transition weeks, >2100) — the
    regime where floor-vs-truncate epoch division and date arithmetic
    diverge.  ``ts_eras="post1970"`` uses only the post-epoch eras:
    Structured Streaming's initial watermark is epoch 0, so stateful
    streaming queries drop pre-1970 event times as late-by-definition
    (platform semantic, probed r11) — the streaming sweep leg runs in
    that defined domain.  ``magnitude_spread`` multiplies each money
    value by a log-uniform power of ten (per-column cap chosen just
    inside that column's DECLARED decimal width — l_extendedprice stays
    under DECIMAL(9,2)'s 1e7, value/totalprice/acctbal under
    DECIMAL(18,4) with sum headroom) — the regime where double-domain
    summation order, catastrophic cancellation, and decimal re-cast
    overflows bite.  ``long_docs`` > 0 rewrites that many documents as
    extreme-length shapes: tens-of-KB running text, a single unbroken
    8k-char token, one word repeated thousands of times, and a long
    multibyte (CJK/emoji) body — the regime where tokenizers, shingle
    counts, and the byte-replay oracles meet length extremes.
    ``dup_event_frac`` > 0 re-emits that fraction of events with the
    SAME event_id but a different ts/value/props payload — the
    at-least-once-delivery shape where any dedup-by-key that keeps an
    engine-arbitrary row (Spark dropDuplicates vs a SQL tie-break)
    silently diverges; invisible on the unique-key driver fixtures.
    ``emb_magnitude_spread`` scales each embedding by a log-uniform
    power of ten spanning float32's usable range (1e-30..1e25, with
    every 7th vector scaled PER-COMPONENT across 1e-15..1e15) — the
    regime where float32 squares underflow/overflow while double-domain
    norms stay finite, and dot products meet catastrophic dynamic
    range.  ``id_offset`` shifts EVERY surrogate id (cust/supp/part/
    order/event/doc/vec/user) and its FK references by a constant —
    ids are opaque int64s, and a negative or near-2^62 offset surfaces
    any id arithmetic that assumes small positive keys (sums, +1 hops,
    modulo sign, sequence materialization).  ``null_fk_frac`` NULLs that
    fraction of events.user_id — the anonymous-traffic shape: joins must
    drop the rows identically, GROUP BY must pool them into one NULL
    group on both engines, and any ORDER BY over the nullable key walks
    into the engines' OPPOSITE null-ordering defaults (Spark ascending =
    NULLS FIRST, DuckDB = NULLS LAST).  The r12 NULL-heavy knobs extend
    that to every remaining optional column: ``null_val_frac`` NULLs
    events.value (aggregate skip-vs-count semantics, NULL arithmetic,
    ordering), ``null_text_frac`` makes documents.text truly NULL (vs
    the blank-"" shape null_frac produces — NULL propagates through
    split/length/regexp where '' yields empty results),
    ``null_etype_frac`` NULLs event_type (a NULL grouping key that
    Spark orders first and DuckDB last), and ``null_label_frac`` NULLs
    embeddings.label (NULL class labels in eval metrics).
    ``unicode_docs`` > 0 rewrites that many documents (planted after
    the duplicate-pair region) as combining-mark / astral-plane shapes:
    NFD decomposed accents (é as e+U+0301), mathematical-alphanumeric
    astral letters, ZWJ emoji families + variation selectors, Indic
    clusters and zero-width joiners inside words — the regime where
    code-point, code-unit, and grapheme counting diverge between
    engines' string functions (distinct from the multibyte-BYTE-length
    class the r11 leg covers).  ``casefold_docs`` > 0 rewrites that many
    documents (planted after the unicode region) as CASE-MAPPING traps —
    Turkish dotted/dotless I, ß/ẞ, Greek final sigma, titlecase
    digraphs, compatibility ligatures — the regime where Java's full
    contextual lowercase (Spark) and utf8proc's simple map (DuckDB)
    return different strings, which is why the engine's fold contract is
    ASCII-scoped (functions/textfold.py).  ``wsp_docs`` > 0 rewrites that
    many documents as EXOTIC-WHITESPACE traps — NBSP, ideographic and
    thin spaces, zero-width spaces inside words, line/paragraph
    separators, and the \\x0b vertical tab where Java's \\s and RE2's
    \\s disagree — the regime behind the explicit split class
    (textfold.WS_RE).  ``layout_files`` > 1 writes every table as a
    DIRECTORY of that many part files with rows SHUFFLED across them
    (r13 layout leg) — the physical shape of any 100 TB dataset
    (thousands of files, no global row order); every result must be
    invariant to it, so a divergence here is a hidden input-order or
    partitioning dependence (first/any_value without a frame, limit
    without order, per-partition RNG).  ``orphan_fk_frac`` rewrites that
    fraction of FK values (o_custkey, l_partkey, l_suppkey,
    events.user_id, and l_orderkey at half rate) to ids OUTSIDE the
    referenced domain (r13 orphan leg) — the dirty-upstream shape where
    inner joins must drop rows identically on both engines and outer
    joins must agree on the unmatched rows.  ``emb_specials`` plants
    IEEE specials in the embedding corpus (r13 specials leg): every
    11th vector gets a NaN component, every 13th a +Inf, every 17th a
    -Inf — the regime where norms, dot products and comparisons meet
    non-finite values, and the two engines' NaN ordering/equality
    conventions have to be reconciled (or the vectors excluded by an
    explicit, observable domain gate on BOTH sides).  ``dup_doc_frac`` /
    ``dup_vec_frac`` re-emit that fraction of documents / embeddings
    with the SAME doc_id/vec_id but a DRIFTED payload (r13 dup-entity
    leg) — the at-least-once-ingest shape for the two entity tables,
    where any per-id join, groupBy, or top-k that keeps an
    engine-arbitrary representative silently diverges (the r11
    dup_event_frac leg covered only events)."""
    eras = _TS_ERAS[2:] if ts_eras == "post1970" else _TS_ERAS
    rng = random.Random(seed)

    def money(lo: float, hi: float, mag: int = 0) -> float:
        if const_values:
            return 100.0
        v = rng.uniform(lo, hi)
        if magnitude_spread and mag:
            # log-uniform exponent: tiny cents through the column's
            # declared-width headroom; keeps every value in-domain for
            # the decimal casts the engine declares (see docstring)
            v *= 10.0 ** rng.randint(-2, mag)
        return round(v, 2)
    def orphan(domain_max: int, real: int, rate_scale: float = 1.0) -> int:
        # an id strictly OUTSIDE the referenced table's id range
        if orphan_fk_frac and rng.random() < orphan_fk_frac * rate_scale:
            return id_offset + domain_max + 10_000 + rng.randint(0, 99)
        return real

    d = Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    ts_us = pa.timestamp("us")

    def tbl(name: str, cols: dict, types: dict) -> None:
        _tbl(d, name, cols, types, layout_files=layout_files, layout_seed=seed)

    tbl("region",
         {"r_regionkey": list(range(5)), "r_name": _REGIONS},
         {"r_regionkey": pa.int32(), "r_name": pa.string()})

    tbl("nation",
         {"n_nationkey": list(range(25)),
          "n_name": [f"NATION_{i}" for i in range(25)],
          "n_regionkey": [rng.randrange(5) for _ in range(25)]},
         {"n_nationkey": pa.int32(), "n_name": pa.string(),
          "n_regionkey": pa.int32()})

    tbl("customer",
         {"c_custkey": [id_offset + i for i in range(1, n_customers + 1)],
          "c_name": [f"Customer#{i:09d}" for i in range(1, n_customers + 1)],
          "c_nationkey": [rng.randrange(25) for _ in range(n_customers)],
          "c_acctbal": [money(-999.99, 9999.99, mag=6) for _ in range(n_customers)],
          "c_mktsegment": [rng.choice(_SEGMENTS) for _ in range(n_customers)]},
         {"c_custkey": pa.int64(), "c_name": pa.string(),
          "c_nationkey": pa.int32(), "c_acctbal": pa.float64(),
          "c_mktsegment": pa.string()})

    tbl("supplier",
         {"s_suppkey": [id_offset + i for i in range(1, n_suppliers + 1)],
          "s_name": [f"Supplier#{i:09d}" for i in range(1, n_suppliers + 1)],
          "s_nationkey": [rng.randrange(25) for _ in range(n_suppliers)],
          "s_acctbal": [money(-999.99, 9999.99, mag=6)
                        for _ in range(n_suppliers)]},
         {"s_suppkey": pa.int64(), "s_name": pa.string(),
          "s_nationkey": pa.int32(), "s_acctbal": pa.float64()})

    tbl("part",
         {"p_partkey": [id_offset + i for i in range(1, n_parts + 1)],
          "p_name": [" ".join(rng.sample(_WORDS, 3)) for _ in range(n_parts)],
          "p_brand": [f"Brand#{rng.randint(1, 25)}" for _ in range(n_parts)],
          "p_type": [rng.choice(_PTYPES) for _ in range(n_parts)],
          "p_size": [rng.randint(1, 50) for _ in range(n_parts)],
          "p_retailprice": [money(900.0, 2000.0, mag=3)
                            for _ in range(n_parts)]},
         {"p_partkey": pa.int64(), "p_name": pa.string(),
          "p_brand": pa.string(), "p_type": pa.string(),
          "p_size": pa.int32(), "p_retailprice": pa.float64()})

    odate0 = dt.datetime(1995, 1, 1)
    if ts_eras:
        odates = []
        for ok in range(1, n_orders + 1):
            e0, edays = eras[ok % len(eras)]
            odates.append(e0 + dt.timedelta(days=rng.randint(0, edays - 1)))
    else:
        odates = [odate0 + dt.timedelta(days=rng.randint(0, 2400))
                  for _ in range(n_orders)]
    tbl("orders",
         {"o_orderkey": [id_offset + i for i in range(1, n_orders + 1)],
          "o_custkey": [orphan(n_customers, id_offset + rng.randint(1, n_customers)) for _ in range(n_orders)],
          "o_orderstatus": [rng.choice("OFP") for _ in range(n_orders)],
          "o_totalprice": [money(900.0, 300000.0, mag=6) for _ in range(n_orders)],
          "o_orderdate": odates,
          "o_orderpriority": [rng.choice(_PRIOS) for _ in range(n_orders)]},
         {"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
          "o_orderstatus": pa.string(), "o_totalprice": pa.float64(),
          "o_orderdate": ts_us, "o_orderpriority": pa.string()})

    li = {k: [] for k in ("l_orderkey", "l_partkey", "l_suppkey",
                          "l_linenumber", "l_quantity", "l_extendedprice",
                          "l_discount", "l_tax", "l_returnflag",
                          "l_linestatus", "l_shipdate")}
    for ok in range(1, n_orders + 1):
        for ln in range(1, rng.randint(1, 7) + 1):
            li["l_orderkey"].append(orphan(n_orders, id_offset + ok, 0.5))
            li["l_partkey"].append(orphan(
                n_parts,
                id_offset
                + (1 if rng.random() < hot_frac else rng.randint(1, n_parts)),
            ))
            li["l_suppkey"].append(
                orphan(n_suppliers, id_offset + rng.randint(1, n_suppliers))
            )
            li["l_linenumber"].append(ln)
            li["l_quantity"].append(float(rng.randint(1, 50)))
            li["l_extendedprice"].append(money(900.0, 100000.0, mag=1))
            # discount/tax stay random even under const_values: they are
            # fractions, and 100.0 would be out-of-domain
            li["l_discount"].append(round(rng.uniform(0.0, 0.1), 2))
            li["l_tax"].append(round(rng.uniform(0.0, 0.08), 2))
            li["l_returnflag"].append(rng.choice("NAR"))
            li["l_linestatus"].append(rng.choice("FO"))
            li["l_shipdate"].append(
                odates[ok - 1] + dt.timedelta(days=rng.randint(1, 120))
            )
    tbl("lineitem", li,
         {"l_orderkey": pa.int64(), "l_partkey": pa.int64(),
          "l_suppkey": pa.int64(), "l_linenumber": pa.int32(),
          "l_quantity": pa.float64(), "l_extendedprice": pa.float64(),
          "l_discount": pa.float64(), "l_tax": pa.float64(),
          "l_returnflag": pa.string(), "l_linestatus": pa.string(),
          "l_shipdate": ts_us})

    def _event_ts(etype: str) -> dt.datetime:
        if ts_eras:
            # era keyed by event_type so per-series gap-fill spines
            # (min..max per type) stay ~3 days, never 140 years
            e0, edays = eras[_ETYPES.index(etype) % len(eras)]
            return e0 + dt.timedelta(
                seconds=rng.randint(0, edays * 86400 - 1),
                microseconds=rng.randint(0, 999_999),
            )
        s = rng.randint(0, span_days * 86400 - 1)
        if ts_grain_s > 0:
            return _T0 + dt.timedelta(seconds=(s // ts_grain_s) * ts_grain_s)
        return _T0 + dt.timedelta(seconds=s, microseconds=rng.randint(0, 999_999))

    etypes = [rng.choice(_ETYPES) for _ in range(n_events)]
    ev = {
        "event_id": [id_offset + i for i in range(n_events)],
        "ts": [_event_ts(et) for et in etypes],
        "user_id": [None if null_fk_frac and rng.random() < null_fk_frac
                    else orphan(
                        n_customers,
                        id_offset
                        + (1 if rng.random() < hot_frac
                           else rng.randint(1, n_customers)),
                    )
                    for _ in range(n_events)],
        "event_type": [None if null_etype_frac and rng.random() < null_etype_frac
                       else et for et in etypes],
        "value": [None if null_val_frac and rng.random() < null_val_frac
                  else money(0.5, 200.0, mag=7) for _ in range(n_events)],
        "props": [None if rng.random() < null_frac
                  else json.dumps({"k": rng.randint(0, 99)})
                  for _ in range(n_events)],
    }
    if dup_event_frac > 0:
        # re-deliver a sample of events: same event_id/type/user (a retry
        # is the same logical event) but a DIFFERENT value/props payload
        # and a ts skewed up to 30 min after the original — inside any
        # 1-hour lateness bound (a realistic at-least-once retry), so
        # watermark-scoped dedup still sees both copies, while any
        # dedup-by-key that keeps an engine-arbitrary row diverges
        for i in range(n_events):
            if rng.random() >= dup_event_frac:
                continue
            ev["event_id"].append(ev["event_id"][i])
            ev["event_type"].append(ev["event_type"][i])
            ev["user_id"].append(ev["user_id"][i])
            ev["ts"].append(ev["ts"][i] + dt.timedelta(
                seconds=rng.randint(1, 1800),
                microseconds=rng.randint(0, 999_999)))
            ev["value"].append(money(0.5, 200.0, mag=7))
            ev["props"].append(json.dumps({"k": rng.randint(0, 99)}))
    tbl("events", ev,
         {"event_id": pa.int64(), "ts": ts_us, "user_id": pa.int64(),
          "event_type": pa.string(), "value": pa.float64(),
          "props": pa.string()})

    texts = []
    for i in range(n_docs):
        if null_frac and rng.random() < null_frac:
            texts.append("")  # blank doc: zero tokens, zero shingles
            continue
        n = rng.randint(10, 120)
        words = [rng.choice(_WORDS) for _ in range(n)]
        texts.append(" ".join(words))
    # plant exact duplicates and near-duplicates like the driver fixture
    for i in range(0, min(20, n_docs - 1), 2):
        texts[i + 1] = texts[i] if i % 4 == 0 else texts[i] + " extra tail"
    # extreme-length documents (long-docs leg), planted at the tail so
    # they never collide with the duplicate pairs above: running text in
    # the tens of KB, one unbroken 8k-char token (a "word" longer than
    # any shingle window), one word repeated thousands of times (maximal
    # n-gram repetition), and a long multibyte body (CJK + emoji — the
    # byte-replay oracles at length, where bytes != chars)
    for j in range(min(long_docs, max(0, n_docs - 21))):
        shape = j % 4
        if shape == 0:
            words = [rng.choice(_WORDS) for _ in range(4000)]
            t = " ".join(words)  # ~24k chars of ordinary prose
        elif shape == 1:
            t = "".join(rng.choice("abcdefgh") for _ in range(8000))
        elif shape == 2:
            t = " ".join([rng.choice(_WORDS)] * 4000)
        else:
            t = "数据处理引擎🚀高速向量 " * 1000  # ~12k chars, ~34k bytes
        texts[n_docs - 1 - j] = t
    # combining-mark / astral-plane documents (r12 unicode leg), planted
    # just past the duplicate-pair region: shapes where code points,
    # UTF-16 code units, and grapheme clusters all disagree
    _UNISHAPES = [
        # NFD decomposed accents: e+COMBINING ACUTE, o+diaeresis — one
        # grapheme, two code points, 3 UTF-8 bytes
        "café déjà vu résumé "
        "zürich naivë ",
        # astral mathematical alphanumerics: every letter is a surrogate
        # pair in UTF-16, 4 UTF-8 bytes
        "\U0001d4bd\U0001d4ee\U0001d4f5\U0001d4f5\U0001d4f8 "
        "\U0001d568\U0001d56c\U0001d56f \U0001d7d8\U0001d7d9 ",
        # ZWJ emoji families + variation selectors + skin-tone modifiers:
        # one grapheme cluster spans up to 7 code points
        "\U0001f468‍\U0001f469‍\U0001f467‍\U0001f466 "
        "\U0001f3f3️‍\U0001f308 \U0001f44d\U0001f3fd ",
        # Indic clusters + zero-width joiners inside words: virama
        # conjuncts where chars != graphemes
        "हिन्दी क्षि "
        "ക്‍ नमस्ते ",
    ]
    for j in range(min(unicode_docs, max(0, n_docs - 24))):
        base_u = _UNISHAPES[j % len(_UNISHAPES)]
        reps = rng.randint(3, 12)
        texts[21 + j] = (base_u * reps).strip()
    if unicode_docs >= 2 and n_docs > 23:
        # one exact duplicate + one near-duplicate pair INSIDE the
        # unicode region so near-dup/shingle paths meet these shapes
        texts[22] = texts[21]
        if n_docs > 24 and unicode_docs >= 3:
            texts[23] = texts[21] + " extra tail"
    # case-mapping trap documents (r12 case-fold leg) — see docstring
    _CASETRAPS = [
        "İstanbul IJssel TITLE Case ı dotless I plain",
        "STRASSE Straße GROSS groß ẞIG ẞ",
        "ΣΙΣΥΦΟΣ σίσυφος ΤΕΛΟΣ MIXEDΣ CASEΣ",
        "ǅungla ǈubav ǋegoš ǲur DŽungla",
        "ﬁle ﬂow ﬀ ligatures ST st FFI ﬃ",
        "ΑΒΓΔΕΖΗΘ αβγδεζηθ Ōsaka ŌSAKA ōsaka",
    ]
    for j in range(min(casefold_docs, max(0, n_docs - 36))):
        base_c = _CASETRAPS[j % len(_CASETRAPS)]
        texts[29 + j] = (base_c + " ") * rng.randint(2, 8)
    if casefold_docs >= 2 and n_docs > 31:
        texts[30] = texts[29]  # exact dup inside the trap region
    # exotic-whitespace trap documents (r12 whitespace leg) — see docstring
    _WSTRAPS = [
        "word joined by nbsp plus normal space",
        "ideographic　space　separated　words here",
        "thin space and hair space mixed in",
        "zero​width​space inside words normally",
        "em space and en space gaps",
        "line separator and paragraph separator marks",
        "tab\tand\nnewline\rand\x0bvertical\x0cform mixed whitespace",
    ]
    for j in range(min(wsp_docs, max(0, n_docs - 48))):
        base_w = _WSTRAPS[j % len(_WSTRAPS)]
        texts[40 + j] = (base_w + " ") * rng.randint(2, 6)
    if null_text_frac:
        # true NULL text (distinct from null_frac's blank ""): NULL
        # propagates through split/length/regexp where '' yields empties
        texts = [None if rng.random() < null_text_frac else t for t in texts]
    doc_ids = [id_offset + i for i in range(n_docs)]
    doc_texts = list(texts)
    doc_langs = ["en" if rng.random() < hot_frac else rng.choice(_LANGS)
                 for _ in range(n_docs)]
    doc_srcs = [f"src{rng.randint(0, 19)}" for _ in range(n_docs)]
    if dup_doc_frac > 0:
        # re-ingest a sample of documents: same doc_id, DRIFTED payload
        # (an extra token, a different source shard) — the at-least-once
        # shape where any per-id representative pick must be total-ordered
        for i in range(n_docs):
            if rng.random() >= dup_doc_frac:
                continue
            doc_ids.append(doc_ids[i])
            t = doc_texts[i]
            doc_texts.append(None if t is None else t + " redelivered")
            doc_langs.append(doc_langs[i])
            doc_srcs.append(f"src{rng.randint(0, 19)}")
    tbl("documents",
         {"doc_id": doc_ids,
          "text": doc_texts,
          "lang": doc_langs,
          "source": doc_srcs,
          "n_chars": [None if t is None else len(t) for t in doc_texts]},
         {"doc_id": pa.int64(), "text": pa.string(), "lang": pa.string(),
          "source": pa.string(), "n_chars": pa.int64()})

    def _emb(i: int) -> list[float]:
        if zero_vec_every and i % zero_vec_every == 0:
            return [0.0] * emb_dim
        v = [rng.gauss(0.0, 1.0) for _ in range(emb_dim)]
        if emb_specials and i > 0:
            if i % 11 == 0:
                v[i % emb_dim] = float("nan")
            if i % 13 == 0:
                v[(i + 1) % emb_dim] = float("inf")
            if i % 17 == 0:
                v[(i + 2) % emb_dim] = float("-inf")
        if emb_magnitude_spread:
            if i % 7 == 0:  # wild per-component dynamic range
                return [x * 10.0 ** rng.randint(-15, 15) for x in v]
            s = 10.0 ** rng.randint(-30, 25)  # per-vector scale
            return [x * s for x in v]
        return v

    embs = [_emb(i) for i in range(n_vecs)]
    vec_ids = [id_offset + i for i in range(n_vecs)]
    labels = [None if null_label_frac and rng.random() < null_label_frac
              else (0 if single_label else rng.randint(0, 9))
              for _ in range(n_vecs)]
    if dup_vec_frac > 0:
        # re-ingest a sample of vectors: same vec_id, slightly DRIFTED
        # embedding (a re-encode) and an independently drawn label
        for i in range(n_vecs):
            if rng.random() >= dup_vec_frac:
                continue
            vec_ids.append(vec_ids[i])
            embs.append([x + 0.001 * rng.gauss(0.0, 1.0) for x in embs[i]])
            labels.append(labels[i])
    tbl("embeddings",
         {"vec_id": vec_ids,
          "embedding": embs,
          "label": labels},
         {"vec_id": pa.int64(), "embedding": pa.list_(pa.float32()),
          "label": pa.int32()})
    return str(d)

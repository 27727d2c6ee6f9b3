"""Data-hygiene operators for training-data curation: PII redaction,
text normalization, and prefix-fingerprint dedup.

These are the scrubbing passes that run over every document before
training (public methodology: C4 / RefinedWeb / Dolma cleaning stages).
All three are pure map or map+one-agg shapes — no join, no explode fanout
— so they scale linearly with corpus bytes and stay inside whole-stage
codegen (no Python in the hot path).

Reference parity note: the reference ETL (fetch_articles.py:79-114) lands
raw article JSON untouched; these operators are the engine-side cleaning
surface SURVEY.md §2b adds on top of that bronze layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import sql_dsum
from azure_func_forem_data_etl_spark.functions.textfold import (
    SQL_FOLD_TEXT,
    ascii_fold,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import table

# Regexes kept to the RE2 ∩ java.util.regex common subset so Spark (Java
# regex) and the DuckDB oracle (RE2) match byte-for-byte.
EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


@register(
    "pii_redaction",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id ||
               '@example.com or +1-555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                      '{PHONE_RE}', '<PHONE>', 'g')) AS INT)
               AS redacted_len
    FROM aug
    """,
    doc="PII redaction: email/phone patterns found, counted, and replaced "
    "with typed placeholders; verified via digest of the redacted text.",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no real PII, so each doc is augmented
    with a deterministic contact line derived from ``doc_id`` — the
    redaction machinery (find/count/replace + digest verification) is the
    operator under test, and it is exactly what runs on a real corpus.

    Map-only: regex scan + replace per row inside codegen, zero shuffles.
    At 100 TB this is embarrassingly parallel and IO-bound — the right
    shape for a scrubbing pass."""
    aug = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("int").alias("redacted_len"),
    )


@register(
    "text_normalize_stats",
    oracle=rf"""
    WITH n AS (
        SELECT doc_id, n_chars,
               trim(regexp_replace(regexp_replace({SQL_FOLD_TEXT},
                                                  '[^a-z0-9 ]', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id,
           md5(norm) AS norm_md5,
           CAST(length(norm) AS INT) AS n_chars_norm,
           CAST(n_chars - length(norm) AS INT) AS n_chars_removed,
           CAST(length(norm) = n_chars AS INT) AS unchanged
    FROM n
    """,
    doc="Text normalization: lowercase, strip non-alphanumerics, collapse "
    "whitespace; digest + size accounting of the canonical form.",
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form normalization is the first stage of every dedup
    pipeline (exact dedup over raw bytes misses trivially-reformatted
    copies).  The canonical text is digest-verified against the oracle so
    the *transform* is checked, not just row counts.  Map-only, codegen,
    zero shuffles."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(ascii_fold("text"), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("int").alias("n_chars_norm"),
        (F.col("n_chars") - F.length(norm)).cast("int").alias("n_chars_removed"),
        (F.length(norm) == F.col("n_chars")).cast("int").alias("unchanged"),
    )


PREFIX_CHARS = 64


@register(
    "prefix_dedup_groups",
    oracle=f"""
    SELECT md5(substring(text, 1, {PREFIX_CHARS})) AS prefix_fp,
           CAST(COUNT(*) AS INT) AS n_docs,
           MIN(doc_id) AS rep_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    HAVING COUNT(*) >= 2
    """,
    doc="Prefix-fingerprint dedup: docs sharing a 64-char prefix digest "
    "grouped; smallest doc_id kept as representative.",
)
def prefix_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection via shared prefixes (cheap complement to
    MinHash: templated pages differ only past their header).  Shuffles
    16-byte digests, never document bodies — the same never-shuffle-
    payloads discipline as ``dedup_exact_text`` — so the shuffle is
    O(rows * 16 B) regardless of document size."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.md5(F.substring("text", 1, PREFIX_CHARS)).alias("prefix_fp")
        )
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.min("doc_id").alias("rep_doc_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_docs") >= 2)
    )


SEGMENT_WORDS = 2  # real deployments segment on sentences/paragraphs


@register(
    "intradoc_segment_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    segs AS (
        SELECT doc_id,
               list_transform(
                   range(CAST(ceil(len(ts) / {SEGMENT_WORDS}.0) AS BIGINT)),
                   i -> array_to_string(
                       ts[i * {SEGMENT_WORDS} + 1 : (i + 1) * {SEGMENT_WORDS}],
                       ' ')) AS sg
        FROM toks
    )
    SELECT doc_id,
           CAST(len(sg) AS INT) AS n_segments,
           CAST(len(list_distinct(sg)) AS INT) AS n_distinct_segments,
           round(1.0 - len(list_distinct(sg)) / CAST(len(sg) AS DOUBLE), 6)
               AS dup_ratio
    FROM segs
    """,
    doc=f"Intra-document dedup: each doc split into consecutive "
    f"{SEGMENT_WORDS}-word segments; repeated-segment ratio per doc "
    "(repeated-paragraph removal signal).",
)
def intradoc_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition detector — the intra-doc complement of
    the cross-corpus near-dup passes (public methodology: Dolma's
    paragraph-level dedup, RefinedWeb line-dedup).  Real deployments
    segment on sentence/paragraph boundaries; the synthetic corpus has no
    punctuation, so segments are fixed SEGMENT_WORDS-word windows — the
    machinery
    (segment → distinct-count → ratio) is identical.

    Scale shape: pure map — the segment array, its distinct count, and the
    ratio are all JVM array lambdas per row (no explode, no shuffle, no
    Python).  At 100 TB this is a single scan, embarrassingly parallel."""
    w = SEGMENT_WORDS
    docs = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    nseg = F.ceil(F.size(toks) / F.lit(float(w))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - F.lit(1)),
        lambda i: F.array_join(F.slice(toks, i * F.lit(w) + 1, F.lit(w)), " "),
    )
    out = docs.select("doc_id", segs.alias("sg"))
    n_seg = F.size("sg")
    n_uniq = F.size(F.array_distinct("sg"))
    return out.select(
        "doc_id",
        n_seg.alias("n_segments"),
        n_uniq.alias("n_distinct_segments"),
        F.round(F.lit(1.0) - n_uniq / n_seg.cast("double"), 6).alias(
            "dup_ratio"
        ),
    )


BOILERPLATE_SHINGLE = 3  # words per shingle
BOILERPLATE_MIN_DOCS = 5  # appears in >= N distinct docs => boilerplate


@register(
    "boilerplate_shingles",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(ts) - {BOILERPLATE_SHINGLE} + 2),
                   i -> array_to_string(
                       ts[i : i + {BOILERPLATE_SHINGLE} - 1], ' '))) AS shingle
        FROM toks
        WHERE len(ts) >= {BOILERPLATE_SHINGLE}
    )
    SELECT shingle, CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs
    FROM sh
    GROUP BY shingle
    HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    """,
    doc=f"Cross-document boilerplate: {BOILERPLATE_SHINGLE}-word shingles "
    f"appearing in >= {BOILERPLATE_MIN_DOCS} distinct docs, with doc "
    "frequencies (header/footer/template removal signal).",
)
def boilerplate_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detector (public methodology: C4's
    three-sentence dedup, RefinedWeb's repeated-line stripping): shingles
    shared by many distinct documents are template text, not content.

    Scale shape: explode fans each doc into ~n_words shingles, then ONE
    shuffle keyed on the shingle for a distinct-doc count; the HAVING
    threshold caps the output at the (small) boilerplate set.  At 100 TB
    the shuffle key should be ``xxhash64(shingle)`` (8 B, not the string)
    with the string re-attached only for the surviving heavy shingles —
    same two-tier trick as ``dedup_exact_text``; the string key is kept
    here because the oracle needs the literal shingle."""
    n = BOILERPLATE_SHINGLE
    docs = table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    sh = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice(F.col("ws"), i, F.lit(n)), " "),
                )
            ).alias("shingle"),
        )
    )
    return (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").cast("int").alias("n_docs"))
        .filter(F.col("n_docs") >= BOILERPLATE_MIN_DOCS)
    )


SOURCE_QUOTA = 10  # max docs kept per source


@register(
    "source_quota_cap",
    oracle=f"""
    SELECT source, doc_id, rk
    FROM (
        SELECT source, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS rk
        FROM documents
    )
    WHERE rk <= {SOURCE_QUOTA}
    """,
    doc=f"Per-source quota sampling: deterministic hash-ordered cap of "
    f"{SOURCE_QUOTA} docs per source (domain-quota curation).",
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain/source quota capping (public methodology: web-corpus domain
    caps a la Common Crawl curation — no single domain may dominate the
    mixture).  Ordering by a hash of the id makes the kept subset
    deterministic yet unbiased by ingestion order.

    Scale shape: one shuffle keyed on source; the ``rk <= N`` filter
    compiles to WindowGroupLimit, so each task keeps only its top-N rows
    per source *before* the shuffle (partial top-k both map- and
    reduce-side).  Skewed mega-sources therefore cost O(N) per task, not
    O(rows-in-source)."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("source", "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SOURCE_QUOTA)
    )


@register(
    "dedup_keep_decision",
    oracle="""
    SELECT doc_id,
           CAST(count(*) OVER (PARTITION BY md5(text)) AS INT) AS group_size,
           CAST(CASE WHEN row_number() OVER (
                    PARTITION BY md5(text)
                    ORDER BY n_chars DESC, doc_id
                ) = 1 THEN 1 ELSE 0 END AS INT) AS keep,
           first_value(doc_id) OVER (
               PARTITION BY md5(text)
               ORDER BY n_chars DESC, doc_id
           ) AS rep_doc_id
    FROM documents
    """,
    doc="Exact-dedup keep/drop decisions: one canonical representative "
    "per content-hash group (longest doc, then lowest id), every doc "
    "labeled keep=0/1 with its group size and representative.",
)
def dedup_keep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable output of exact dedup — not just group counts
    (``dedup_exact_text``) but a per-document keep/drop verdict a
    downstream writer can apply directly.  Canonical choice (longest,
    then lowest id) is deterministic, so replays produce identical
    decisions.

    Scale shape: one shuffle keyed on the 16-byte content hash (bodies
    never shuffle); both window functions share the single sort within
    each hash group.  Groups are tiny (true duplicates), so no skew."""
    from pyspark.sql import Window

    fp = F.md5(F.col("text"))
    w_ord = Window.partitionBy(fp).orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w_all = Window.partitionBy(fp)
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.count("*").over(w_all).cast("int").alias("group_size"),
        F.when(F.row_number().over(w_ord) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("keep"),
        F.first_value("doc_id").over(w_ord).alias("rep_doc_id"),
    )


ERASURE_MOD = 97  # user_id/custkey % 97 == 0 -> deterministic erasure set


@register(
    "erasure_propagation_audit",
    oracle=f"""
    WITH del AS (
        SELECT c_custkey AS uid FROM customer WHERE c_custkey % {ERASURE_MOD} = 0
    ),
    ev AS (
        SELECT COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_subjects
        FROM events WHERE user_id IN (SELECT uid FROM del)
    ),
    od AS (
        SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_subjects
        FROM orders WHERE o_custkey IN (SELECT uid FROM del)
    ),
    li AS (
        SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_subjects
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IN (SELECT uid FROM del)
    )
    SELECT 'events' AS tbl, n_rows, n_subjects FROM ev
    UNION ALL SELECT 'orders', n_rows, n_subjects FROM od
    UNION ALL SELECT 'lineitem', n_rows, n_subjects FROM li
    """,
    doc="Right-to-be-forgotten sweep: per-table row/subject counts reachable from a delete list, incl. the indirect lineitem cascade via orders.",
)
def erasure_propagation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-delete audit a GDPR/CCPA erasure job runs: given a subject
    delete-list, how many rows in each table reference those subjects —
    directly (events.user_id, orders.o_custkey) or transitively
    (lineitem via its order's customer).  The delete-list is a broadcast
    LEFT SEMI join against every fact table (the list is ~users-scale,
    facts are ~100 TB; the facts never shuffle, each leg is one scan +
    one tiny agg).  The actual deletion is these same semi-joins flipped
    to anti-join rewrites of the underlying files."""
    from pyspark.sql import functions as F  # noqa: F401  (module-level F in scope)

    cust = table(spark, sf_dir, "customer")
    del_list = (
        cust.filter(F.col("c_custkey") % ERASURE_MOD == 0)
        .select(F.col("c_custkey").alias("uid"))
    )
    ev = (
        table(spark, sf_dir, "events")
        .join(F.broadcast(del_list), F.col("user_id") == F.col("uid"), "left_semi")
        .agg(
            F.lit("events").alias("tbl"),
            F.count("*").alias("n_rows"),
            F.count_distinct("user_id").alias("n_subjects"),
        )
    )
    orders = table(spark, sf_dir, "orders")
    od = (
        orders.join(
            F.broadcast(del_list), F.col("o_custkey") == F.col("uid"), "left_semi"
        )
        .agg(
            F.lit("orders").alias("tbl"),
            F.count("*").alias("n_rows"),
            F.count_distinct("o_custkey").alias("n_subjects"),
        )
    )
    li = (
        table(spark, sf_dir, "lineitem")
        .join(
            orders.join(
                F.broadcast(del_list),
                F.col("o_custkey") == F.col("uid"),
                "left_semi",
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.lit("lineitem").alias("tbl"),
            F.count("*").alias("n_rows"),
            F.count_distinct("o_custkey").alias("n_subjects"),
        )
    )
    return ev.unionAll(od).unionAll(li)


K_ANON_THRESHOLD = 5


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           CAST(group_size < {K_ANON_THRESHOLD} AS INT) AS violates_k
    FROM g
    """,
    doc=f"k-anonymity audit over the (nation, segment) quasi-identifier: equivalence-class sizes, flagged below k={K_ANON_THRESHOLD}.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy-release gate: a table is k-anonymous w.r.t. its
    quasi-identifiers iff every equivalence class has >= k members;
    classes below k re-identify individuals when joined with outside
    data.  One map-combine agg keyed on the QI tuple — at 100 TB this is
    the cheapest possible audit, and the remediation (generalize or
    suppress the violating classes) filters on its output."""
    cust = table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("group_size"))
        .withColumn(
            "violates_k",
            (F.col("group_size") < K_ANON_THRESHOLD).cast("int"),
        )
    )


#: Laplace scale for the DP histogram release (b = sensitivity/epsilon;
#: per-doc sensitivity of a lang histogram is 1, so b=2.0 <=> eps=0.5).
DP_LAPLACE_B = 2.0

#: Salt for the noise draw: a release-id so reruns of the SAME release
#: reproduce the noise (and a NEW release-id would redraw it).
DP_RELEASE_SALT = "dp-release-1"


@register(
    "dp_noisy_lang_counts",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_true FROM documents GROUP BY lang
    ),
    draw AS (
        SELECT lang, n_true,
               (('0x' || substring(md5('{DP_RELEASE_SALT}:' || lang), 1, 8))::BIGINT
                + 0.5) / 4294967296.0 - 0.5 AS uc
        FROM counts
    )
    SELECT lang, n_true,
           round(-{DP_LAPLACE_B} * sign(uc) * ln(1.0 - 2.0 * abs(uc)), 6) AS noise,
           round(n_true - {DP_LAPLACE_B} * sign(uc) * ln(1.0 - 2.0 * abs(uc)), 6)
               AS n_noisy
    FROM draw
    """,
    doc=f"Differentially-private language histogram: Laplace(b={DP_LAPLACE_B}) "
    "noise via inverse-CDF over a seeded md5 uniform (eps=0.5, sens=1).",
)
def dp_noisy_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP-noised histogram release — the privacy-preserving counterpart of
    the k-anonymity audit: per-language doc counts plus Laplace noise
    drawn by inverse transform sampling from a SEEDED md5-derived uniform
    (u in (0,1) exactly; noise = -b*sign(u-.5)*ln(1-2|u-.5|)).

    Determinism across engines/reruns is the point of the hash draw: a
    given (release-salt, lang) always yields the same noise — auditable
    and replayable — while a new release salt redraws independently.
    ``n_true`` is emitted alongside for THIS calibration-audit view; a
    production release would publish only ``n_noisy``.

    Scale shape: one scan into a |langs|-row aggregate; the noise math is
    a scalar expression on that tiny table. Nothing else moves.
    """
    counts = table(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n_true")
    )
    x = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{DP_RELEASE_SALT}:"), F.col("lang"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    uc = (x + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(0.5)
    noise = -F.lit(DP_LAPLACE_B) * F.signum(uc) * F.log(F.lit(1.0) - 2.0 * F.abs(uc))
    return counts.select(
        "lang",
        "n_true",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n_true") + noise, 6).alias("n_noisy"),
    )


# ---------------------------------------------------------------------------
# Hash-based experiment assignment (round 8)

AB_ARMS = 3


def _ab_assign_oracle() -> str:
    """DuckDB replay of consistent-hash experiment bucketing: arm =
    pmod(xxhash64(user_id), 3) replayed bit-exactly via the HUGEINT
    hashLong chain (functions/xxh64_sql.py), then per-arm integer counts
    and the exact-decimal value sum.  pmod must run on the SIGNED hash
    (u64 % 3 differs: 2^64 ≡ 1 mod 3)."""
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X

    hash_ctes = X.xxh64_longs_expr_ctes(
        "ah", "uids", ["user_id"], ["user_id"], X.SPARK_HASH_SEED
    )
    signed = X.signed64("h")
    return f"""
    -- identified traffic only (r11 null-FK sweep): an anonymous
    -- (NULL-user) event has no assignment unit — Spark's xxhash64
    -- SKIPS null inputs (hash = seed), silently pooling all anonymous
    -- events into one arm, while the SQL hash join drops them
    WITH uids AS (SELECT DISTINCT user_id FROM events
                  WHERE user_id IS NOT NULL),
    {hash_ctes},
    arms AS (
        SELECT user_id, (({signed} % {AB_ARMS}) + {AB_ARMS}) % {AB_ARMS} AS arm
        FROM ah_hash
    )
    SELECT a.arm,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('e.value')} AS value_total
    FROM events e JOIN arms a ON a.user_id = e.user_id
    GROUP BY 1
    """


@register(
    "ab_assignment_srm",
    defer=2,
    oracle=_ab_assign_oracle(),
    doc=f"Consistent-hash experiment bucketing: arm = pmod(xxhash64("
    f"user_id), {AB_ARMS}); per-arm user/event counts and exact value "
    "totals — the sample-ratio-mismatch audit view.",
)
def ab_assignment_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment assignment the way production systems do
    it: hash the unit id, bucket by modulus — stable across runs, joins,
    and backfills, with no assignment table to maintain.  The per-arm
    counts are the SRM (sample-ratio mismatch) audit every A/B readout
    starts with.  One map-side hash + one keyed agg; the exact-decimal
    value sum keeps the readout hash-comparable across engines."""
    from azure_func_forem_data_etl_spark.functions.exact import dsum

    # identified traffic only — see the oracle note (r11 null-FK sweep)
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    arm = F.pmod(F.xxhash64("user_id"), F.lit(AB_ARMS))
    return (
        ev.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
            dsum("value").alias("value_total"),
        )
    )

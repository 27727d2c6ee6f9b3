"""Text analysis over the documents table (SURVEY.md §2b, north-star LLM
pipeline): quality scoring, token counting, language ID, fingerprinting.

Everything stays JVM-side (built-in string/array/lambda expressions inside
whole-stage codegen) — no Python UDFs in these paths, so they scale to
100 TB limited only by scan + one optional shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_func_forem_data_etl_spark.functions.exact import dround
from azure_func_forem_data_etl_spark.functions.textfold import (
    SQL_FOLD_TEXT,
    SQL_SPLIT_FOLDED,
    WS_RE,
    ascii_fold,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    broadcast_derived,
    entity_table,
    table,
)

# Shared stopword list (kept tiny and identical in Spark + SQL twins).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
_SW_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Token pattern: word runs or single non-word non-space chars (BPE-ish
# pre-tokenization split, cf. GPT-2 pattern's word/punct split).
# explicit whitespace set, not \s: Java and RE2 disagree on \x0B
# (see functions/textfold.py WS_RE)
TOKEN_RE = r"[a-z0-9]+|[^a-z0-9 \t\n\f\r\x0b]"

# Language marker words (the point is the argmax machinery, not NLP
# accuracy; corpus vocabulary is English tech words).
LANG_MARKERS = {
    "en": ("the", "a", "and", "is", "of"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "y", "las", "una"),
    "de": ("der", "die", "das", "und", "ein"),
}


def _hits(words_col: str, markers: tuple[str, ...]) -> F.Column:
    inlist = ", ".join(f"'{w}'" for w in markers)
    return F.expr(f"size(filter({words_col}, w -> w IN ({inlist})))")


def _sql_hits(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in markers)
    return f"len(list_filter(words, w -> w IN ({inlist})))"


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           n_words,
           n_distinct_words,
           avg_word_len,
           stopword_ratio,
           0.5 * stopword_ratio
             + 0.3 * least(n_words / 100.0, 1.0)
             + 0.2 * (n_distinct_words / n_words) AS quality_score
    FROM (
        SELECT doc_id,
               len(words) AS n_words,
               len(list_distinct(words)) AS n_distinct_words,
               length(replace(text, ' ', '')) / len(words) AS avg_word_len,
               len(list_filter(words, w -> w IN ({_SW_SQL}))) / len(words) AS stopword_ratio
        FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents)
        WHERE len(words) > 0
    )
    """,
    doc="Quality scoring: length/stopword/distinctness ratios -> composite score.",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.withColumn("words", F.split("text", " ")).filter(F.size("words") > 0)
    d = d.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct_words"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / F.size("words")).alias(
            "avg_word_len"
        ),
        (_hits("words", STOPWORDS) / F.size("words")).alias("stopword_ratio"),
    )
    return d.withColumn(
        "quality_score",
        0.5 * F.col("stopword_ratio")
        + 0.3 * F.least(F.col("n_words") / 100.0, F.lit(1.0))
        + 0.2 * (F.col("n_distinct_words") / F.col("n_words")),
    )


@register(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
           n_chars,
           len(regexp_extract_all(text, '{TOKEN_RE}')) / greatest(n_chars, 1) AS tokens_per_char
    FROM documents
    """,
    doc="BPE-ish pre-tokenization count (word runs + punctuation singletons).",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        "n_chars",
        (n_tokens / F.greatest("n_chars", F.lit(1))).alias("tokens_per_char"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    -- || not concat: DuckDB's concat() treats NULL args as '', while
    -- Spark's concat (and || here) propagates NULL — a NULL-text doc
    -- has NO content, so its fingerprint is NULL on both engines
    -- (r12 NULL-heavy sweep)
    SELECT doc_id,
           md5(lang || ':' || trim(text)) AS fingerprint,
           substr(md5(lang || ':' || trim(text)), 1, 8) AS shard_key
    FROM documents
    """,
    doc="Deterministic content fingerprint (md5 over normalized text); shard prefix for routing; NULL text => NULL fingerprint.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(F.concat(F.col("lang"), F.lit(":"), F.trim("text")))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("shard_key")
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ), df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(FLOOR(tf.tf * 1000000.0 * n.n_docs / df.df) AS BIGINT) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term
        ) AS rn
        FROM scored
    )
    WHERE rn <= 3
    """,
    doc=(
        "TF-IDF top-3 terms per doc. Rational idf (N/df, scaled+floored to "
        "int) instead of log so scores are bit-identical across engines; "
        "ranking is order-isomorphic to log idf. The ml.feature HashingTF+IDF "
        "path is the fitted-pipeline alternative."
    ),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    # df derives from tf — one row per (doc, term) means COUNT(*) per term
    # IS the distinct-doc count: the corpus explodes once and the
    # countDistinct Expand disappears (r13, guide §2.3/2.4)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        # df side is |vocab|-sized: hint gated on source size (r14 #7)
        tf.join(broadcast_derived(df, sf_dir, "documents"), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.floor(F.col("tf") * 1000000.0 * F.col("n_docs") / F.col("df")).cast(
                "bigint"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


_LANG_CASE_SQL = """
    CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
         WHEN s_fr >= s_es AND s_fr >= s_de THEN 'fr'
         WHEN s_es >= s_de THEN 'es'
         ELSE 'de' END
"""


@register(
    "lang_id_markers",
    oracle=f"""
    SELECT doc_id, s_en, s_fr, s_es, s_de,
           {_LANG_CASE_SQL} AS predicted_lang,
           lang AS actual_lang,
           CAST(({_LANG_CASE_SQL}) = lang AS INT) AS is_match
    FROM (
        SELECT doc_id, lang,
               {_sql_hits(LANG_MARKERS['en'])} AS s_en,
               {_sql_hits(LANG_MARKERS['fr'])} AS s_fr,
               {_sql_hits(LANG_MARKERS['es'])} AS s_es,
               {_sql_hits(LANG_MARKERS['de'])} AS s_de
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS words FROM documents)
    )
    """,
    doc="Language ID via marker-word scores + deterministic argmax.",
)
def lang_id_markers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.withColumn("words", F.split("text", " ")).select(
        "doc_id",
        "lang",
        _hits("words", LANG_MARKERS["en"]).alias("s_en"),
        _hits("words", LANG_MARKERS["fr"]).alias("s_fr"),
        _hits("words", LANG_MARKERS["es"]).alias("s_es"),
        _hits("words", LANG_MARKERS["de"]).alias("s_de"),
    )
    predicted = F.expr(_LANG_CASE_SQL)
    return d.select(
        "doc_id",
        "s_en",
        "s_fr",
        "s_es",
        "s_de",
        predicted.alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
        (predicted == F.col("lang")).cast("int").alias("is_match"),
    )


@register(
    "regexp_text_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, 's[a-z]+') AS first_s_word,
           CAST(length(regexp_extract_all(text, 's[a-z]+')) AS INT) AS n_s_words,
           substr(regexp_replace(text, '[aeiou]', '', 'g'), 1, 40)
               AS devoweled_prefix
    FROM documents
    """,
    doc="Regex scalar functions (extract / extract_all count / global "
    "replace) — pure codegen string expressions, no shuffle at all.",
)
def regexp_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A narrow map-only plan: per-row regex work parallelizes with the file
    splits, so 100 TB costs exactly one scan.  Patterns stick to character
    classes + quantifiers, the regex subset with identical semantics in
    Java (Spark) and RE2 (DuckDB/oracle)."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_extract("text", "s[a-z]+", 0).alias("first_s_word"),
        F.size(F.expr("regexp_extract_all(text, 's[a-z]+', 0)")).alias("n_s_words"),
        F.substring(F.regexp_replace("text", "[aeiou]", ""), 1, 40).alias(
            "devoweled_prefix"
        ),
    )


@register(
    "doc_chunking",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
        SELECT doc_id, words,
               unnest(generate_series(1, greatest(len(words), 1), 25)) AS start
        FROM w
    )
    SELECT doc_id,
           CAST((start - 1) / 25 AS INT) AS chunk_id,
           array_to_string(list_slice(words, start, start + 49), ' ')
               AS chunk_text,
           CAST(len(list_slice(words, start, start + 49)) AS INT) AS n_tokens
    FROM c
    """,
    doc="LLM-pipeline document chunking: overlapping 50-token windows with "
    "stride 25 via sequence+explode+slice — no UDF, scales with the scan.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunker: each doc becomes ceil(len/25) overlapping
    chunks of <=50 tokens.  The whole operator is three codegen expressions
    (sequence, explode, slice) — per-row fanout is bounded by doc length, so
    a 100 TB corpus chunks in one map-only pass with zero shuffle."""
    w = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    c = w.select(
        "doc_id",
        "words",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.size("words"), F.lit(1)), F.lit(25))
        ).alias("start"),
    )
    chunk = F.slice("words", F.col("start"), F.lit(50))
    return c.select(
        "doc_id",
        ((F.col("start") - 1) / 25).cast("int").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


@register(
    "dataset_split_hash",
    oracle="""
    WITH h AS (
        SELECT doc_id, n_chars,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS hx
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN hx BETWEEN '0' AND 'b' THEN 'train'
                WHEN hx IN ('c', 'd') THEN 'val'
                ELSE 'test' END AS split,
           n_chars
    FROM h
    """,
    doc="Deterministic train/val/test split (75/12.5/12.5) from the first "
    "md5 hex nibble of the stable id — engine-portable, rerun-stable.",
)
def dataset_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based dataset splitting, the LLM-pipeline alternative to
    randomSplit: md5 is identical everywhere (unlike engine-native hash
    functions), so the assignment survives reruns, engine swaps, and
    repartitioning — and joins against any future version of the corpus."""
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(hx.between("0", "b"), "train")
        .when(hx.isin("c", "d"), "val")
        .otherwise("test")
        .alias("split"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition quality rules

# Thresholds sit inside the corpus distributions (uniq_word_frac median
# ~0.46, top_word_frac ~0.09, top_bigram_frac ~0.03) so the keep flag
# splits the corpus non-trivially rather than rubber-stamping everything.


def _max_run_expr(arr_col: str) -> F.Column:
    """Highest term frequency in an array column, computed row-locally:
    sort the array, then a single run-length fold.  NULL init + null-safe
    compare make the first element start a fresh run."""
    return F.expr(
        f"""aggregate(
          array_sort({arr_col}),
          struct(CAST(NULL AS STRING) AS prev, 0L AS run, 0L AS best),
          (acc, x) -> struct(
              x AS prev,
              IF(x <=> acc.prev, acc.run + 1L, 1L) AS run,
              GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L)) AS best),
          acc -> acc.best)"""
    )


REP_MIN_UNIQ_FRAC = 0.35
REP_MAX_TOP_WORD_FRAC = 0.12
REP_MAX_TOP_BIGRAM_FRAC = 0.06


@register(
    "quality_repetition_rules",
    oracle=rf"""
    -- canonical doc grain (r13 dup-entity leg): one row per doc_id
    WITH documents_canon AS {SQL_DOCS_CANON},
    d AS (
        SELECT doc_id, {SQL_SPLIT_FOLDED} AS ws
        FROM documents_canon
    ),
    wc AS (SELECT doc_id, UNNEST(ws) AS word FROM d),
    bc AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bigram
        FROM d
    ),
    wstat AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               COUNT(*) AS n_uniq, MAX(c) AS top_word_cnt
        FROM (SELECT doc_id, word, COUNT(*) AS c FROM wc
              GROUP BY doc_id, word) t
        GROUP BY doc_id
    ),
    bstat AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               MAX(c) AS top_bigram_cnt
        FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM bc
              GROUP BY doc_id, bigram) t
        GROUP BY doc_id
    )
    SELECT w.doc_id, n_words,
           round(n_uniq / CAST(n_words AS DOUBLE), 6) AS uniq_word_frac,
           round(top_word_cnt / CAST(n_words AS DOUBLE), 6) AS top_word_frac,
           round(top_bigram_cnt / CAST(n_bigrams AS DOUBLE), 6)
               AS top_bigram_frac,
           CAST(round(n_uniq / CAST(n_words AS DOUBLE), 6)
                    >= {REP_MIN_UNIQ_FRAC}
                AND round(top_word_cnt / CAST(n_words AS DOUBLE), 6)
                    <= {REP_MAX_TOP_WORD_FRAC}
                AND round(top_bigram_cnt / CAST(n_bigrams AS DOUBLE), 6)
                    <= {REP_MAX_TOP_BIGRAM_FRAC} AS INT) AS keep
    FROM wstat w JOIN bstat b ON w.doc_id = b.doc_id
    """,
    doc="Repetition-based quality rules (Gopher-style): unique-word "
    "fraction, top-word fraction, top-bigram fraction -> keep flag.",
)
def quality_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals are the curation rules length/stopword ratios
    can't see: a doc that loops one phrase has normal length stats but an
    abnormal top-bigram share (Rae et al., Gopher appendix A1.1 — public
    methodology).

    Every statistic here is row-local (a doc's own term frequencies), so
    the whole operator is a ZERO-SHUFFLE map: unique counts via
    ``array_distinct``, mode counts via a sort + run-length fold inside
    whole-stage codegen — no explode, no (doc_id, gram) shuffle, no join.
    The earlier explode+groupBy formulation shuffled every word and
    bigram occurrence twice (~3.4x slower at sf0.1, and at 100 TB the
    shuffle would dominate); per-row O(L log L) sorting replaces it with
    pure map parallelism.  Fractions are ratios of exact int64 counts,
    rounded to 6dp — engine-stable.  Single-word docs carry no bigram
    signal and are excluded (same as the oracle's inner wstat⋈bstat
    join)."""
    docs = entity_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split(ascii_fold("text"), WS_RE).alias("ws"),
    ).filter(F.size("ws") >= 2)
    d = d.withColumn(
        "bs",
        F.expr(
            "transform(sequence(1, size(ws) - 1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
        ),
    )
    stats = d.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("long").alias("n_uniq"),
        _max_run_expr("ws").alias("top_word_cnt"),
        F.size("bs").cast("long").alias("n_bigrams"),
        _max_run_expr("bs").alias("top_bigram_cnt"),
    )
    uniq_frac = F.round(F.col("n_uniq") / F.col("n_words").cast("double"), 6)
    topw_frac = F.round(F.col("top_word_cnt") / F.col("n_words").cast("double"), 6)
    topb_frac = F.round(
        F.col("top_bigram_cnt") / F.col("n_bigrams").cast("double"), 6
    )
    return stats.select(
        "doc_id",
        "n_words",
        uniq_frac.alias("uniq_word_frac"),
        topw_frac.alias("top_word_frac"),
        topb_frac.alias("top_bigram_frac"),
        (
            (uniq_frac >= REP_MIN_UNIQ_FRAC)
            & (topw_frac <= REP_MAX_TOP_WORD_FRAC)
            & (topb_frac <= REP_MAX_TOP_BIGRAM_FRAC)
        )
        .cast("int")
        .alias("keep"),
    )


# ---------------------------------------------------------------------------
# corpus-LM fluency score (CCNet-style unigram log-prob)


@register(
    "unigram_logprob_score",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
    tot AS (SELECT COUNT(*) AS t FROM w),
    scored AS (
        SELECT w.doc_id,
               CAST(round(log10(cnt / CAST(t AS DOUBLE)), 4)
                    AS DECIMAL(18,4)) AS logp
        FROM w JOIN freq ON w.word = freq.word CROSS JOIN tot
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(logp) AS DOUBLE) AS sum_log10_prob
    FROM scored GROUP BY doc_id
    """,
    doc="CCNet-style fluency score: mean unigram log10-probability under "
    "the corpus's own word distribution (decimal-domain sum).",
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-model filter of CCNet/C4-style curation (public
    methodology), reduced to its unigram core: score each doc by the mean
    log-probability of its words under the corpus unigram distribution.
    Low scorers are gibberish / rare-token soup; high scorers are
    made of common words.

    Scale shape: ONE explode pass feeds both the frequency table and the
    scoring join; the frequency table is vocabulary-sized (≪ corpus) and
    broadcasts; the total-count scalar is a one-row broadcast.  Per-word
    log10 values are quantized at 4dp (margin ≫ any libm-vs-JVM 1-ulp
    difference) and summed as DECIMAL so the aggregation is
    associative-exact (same trick as functions/exact.py) — results don't
    depend on partition order or engine; consumers derive the mean as
    sum_log10_prob / n_words.

    r13 optimization (guide §2.3): the corpus-total count derives from
    the vocabulary-sized frequency table instead of a second full token
    pass, and log10/round/decimal-cast run once per word TYPE (the
    scoring join attaches a precomputed logp) instead of once per token.
    The token stream still explodes twice (frequency pass + scoring
    pass) — a first-draft single-explode variant that aggregated
    (doc, word) frequencies replaced those map-only passes with a
    corpus-sized shuffle and measured ×1.07-1.19 SLOWER at matched
    conditions, so explode-twice is the deliberate shape."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    freq = w.groupBy("word").agg(F.count("*").alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("t"))
    score = freq.join(F.broadcast(tot)).select(
        "word",
        F.round(
            F.log10(F.col("cnt").cast("double") / F.col("t").cast("double")), 4
        )
        .cast("decimal(18,4)")
        .alias("logp"),
    )
    # |vocab|-sized score table: hint gated on source size (r14 #7)
    scored = w.join(broadcast_derived(score, sf_dir, "documents"), "word")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("logp").cast("double").alias("sum_log10_prob"),
    )


# ---------------------------------------------------------------------------
# BM25 relevance scoring against a fixed query

BM25_QUERY_TERMS = ("spark", "window", "stream")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 50


@register(
    "bm25_topk_docs",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS d_len FROM w GROUP BY doc_id),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(d_len) AS DOUBLE) / COUNT(*) AS avg_dl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM w
        WHERE word IN ('spark', 'window', 'stream')
        GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    scored AS (
        SELECT tf.doc_id,
               CAST(round(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * ({BM25_K1} + 1))
                   / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                        + {BM25_B} * dl.d_len / stats.avg_dl)), 4)
                   AS DECIMAL(18,4)) AS term_score
        FROM tf JOIN df USING (word)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats
    )
    SELECT doc_id, CAST(SUM(term_score) AS DOUBLE) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT {BM25_TOP}
    """,
    doc="BM25 top-k document ranking for a fixed term query (Okapi "
    "formula, 4dp-quantized per-term scores, decimal-exact sum).",
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 — the lexical-retrieval baseline every RAG/IR stack
    ships next to its embedding index (public formula, Robertson &
    Zaragoza 2009).  Documents ranked against a fixed 3-term query.

    Scale shape: term frequencies only materialize for the QUERY terms
    (the WHERE prunes the exploded stream before any shuffle), document
    frequency is a query-terms-sized broadcast, and the global n/avgdl
    stats are a one-row broadcast.  Top-k is TakeOrdered, never a global
    sort.  Per-term scores are 4dp-quantized then summed in the decimal
    domain — same engine-exactness discipline as unigram_logprob_score
    (ln/idf is the only float transcendental, and its 1-ulp risk is ≪
    the 1e-4 quantum)."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    dl = w.groupBy("doc_id").agg(F.count("*").alias("d_len"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("d_len").cast("double") / F.count("*")).alias("avg_dl"),
    )
    tf = (
        w.filter(F.col("word").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("d_len") / F.col("avg_dl")
    )
    term_score = F.round(idf * (F.col("tf") * (BM25_K1 + 1)) / denom, 4).cast(
        "decimal(18,4)"
    )
    scored = (
        tf.join(broadcast_derived(df, sf_dir, "documents"), "word")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", term_score.alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score").cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOP)
    )


# ---------------------------------------------------------------------------
# exact-size stratified sampling

STRATA_SAMPLE_N = 10


@register(
    "stratified_sample_per_lang",
    oracle=f"""
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rn
        FROM documents
    ) t WHERE rn <= {STRATA_SAMPLE_N}
    """,
    doc=f"Exact-size stratified sample: {STRATA_SAMPLE_N} docs per "
    "language, ordered by md5 of the id (deterministic, engine-portable).",
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n-per-stratum sampling — what ``sampleBy`` can't give you
    (it is probabilistic per row).  Ordering by the md5 of the id makes
    the pick pseudo-random yet identical on any engine, rerun, or
    partitioning; ``row_number <= n`` compiles to WindowGroupLimit, so
    each partition keeps a per-stratum heap and the shuffle carries at
    most n rows per stratum — never the full corpus ordering."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= STRATA_SAMPLE_N)
        .select("doc_id", "lang")
    )


@register(
    "doc_length_quartiles",
    oracle="""
    -- length-binning domain: docs WITH a length (r12 NULL-heavy sweep —
    -- a NULL n_chars would land in tile 1 on Spark's NULLS FIRST and
    -- tile 4 on DuckDB's NULLS LAST)
    WITH t AS (
        SELECT doc_id, n_chars,
               ntile(4) OVER (ORDER BY n_chars, doc_id) AS tile
        FROM documents WHERE n_chars IS NOT NULL
    )
    SELECT CAST(tile AS INT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM t
    GROUP BY tile
    """,
    doc="Length-quartile assignment (ntile) + per-tile size profile: the "
    "binning step behind length-balanced training mixtures.",
)
def doc_length_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning via ntile over a unique (n_chars, doc_id) order —
    deterministic tile assignment, then a tiny per-tile profile agg.

    Scale note: a global ntile needs a total order; Spark executes it as
    one window over a range-partitioned sort, which is acceptable because
    the windowed relation is (doc_id, n_chars) — 16 bytes/row, not
    document bodies.  For 100 TB corpora the approx-percentile cut-point
    variant (compute 3 cut points, broadcast, map-assign) avoids the sort
    entirely; that shape is ``width_bucket_histogram``'s and the exact
    ntile here doubles as its oracle."""
    # docs WITH a length only — see the oracle note (r12 NULL-heavy sweep)
    docs = table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = Window.orderBy("n_chars", "doc_id")
    t = docs.select("doc_id", "n_chars", F.ntile(4).over(w).alias("tile"))
    return t.groupBy(F.col("tile").cast("int").alias("tile")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


INVERTED_INDEX_CAP = 10   # postings kept per token
INVERTED_INDEX_MIN_DF = 5  # drop near-unique tokens


@register(
    "inverted_index_postings",
    oracle=f"""
    WITH t AS (
        SELECT DISTINCT doc_id, word AS token
        FROM documents, UNNEST(string_split(text, ' ')) AS u(word)
        WHERE word <> ''
    )
    SELECT token,
           COUNT(*) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:{INVERTED_INDEX_CAP}], ',')
               AS postings
    FROM t GROUP BY token
    HAVING COUNT(*) >= {INVERTED_INDEX_MIN_DF}
    """,
    doc="Inverted index build: token -> document frequency + first-K "
    "posting list (K=10), min-df filtered — the retrieval-index shape "
    "with hub-token memory bounded by the cap.",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: a stopword's full posting list at 100 TB is millions
    of ids, so the cap is enforced BEFORE collection — a row_number over
    (token, doc_id) keeps only the first K postings per token while df is
    counted over the whole partition in the same window pass.  One
    shuffle; per-token collected state is <= K ids regardless of how hot
    the token is.  Tokenizer is the single-space split shared with the
    oracle (empty tokens dropped on both sides)."""
    docs = table(spark, sf_dir, "documents")
    t = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
        .distinct()
    )
    w = Window.partitionBy("token").orderBy("doc_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = t.select(
        "token",
        "doc_id",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(wall).alias("df"),
    ).filter(
        (F.col("__rn") <= INVERTED_INDEX_CAP)
        & (F.col("df") >= INVERTED_INDEX_MIN_DF)
    )
    return ranked.groupBy("token").agg(
        F.first("df").alias("df"),
        # string-rendered postings: uniform scalar schema for the driver
        F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
            "postings"
        ),
    )


NOVELTY_NGRAM = 3
NOVELTY_COMMON_DF = 5  # an n-gram in >= this many docs is "common"


@register(
    "ngram_novelty_score",
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    g AS (
        SELECT DISTINCT doc_id,
               words[i] || ' ' || words[i + 1] || ' ' || words[i + 2] AS gram
        FROM (
            SELECT doc_id, string_split(text, ' ') AS words
            FROM documents_canon
        ), UNNEST(generate_series(1, len(words) - {NOVELTY_NGRAM - 1})) AS t(i)
        WHERE len(words) >= {NOVELTY_NGRAM}
    ),
    df AS (SELECT gram, COUNT(*) AS df FROM g GROUP BY gram)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE df.df < {NOVELTY_COMMON_DF}) AS BIGINT)
               AS n_novel,
           CAST(COUNT(*) FILTER (WHERE df.df < {NOVELTY_COMMON_DF}) AS DOUBLE)
               / COUNT(*) AS novelty
    FROM g JOIN df ON g.gram = df.gram
    GROUP BY g.doc_id
    """,
    doc="N-gram novelty score: fraction of a doc's distinct 3-grams NOT "
    "common in the corpus (df < 5) — the boilerplate/memorization "
    "filter between exact dedup and near-dup in a curation funnel.",
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: (doc, gram) explodes once, then document frequency is
    a COUNT over the gram-partitioned window — the df values ride the
    same exchange the grouping would need, so the whole query is TWO
    exchanges (gram window, per-doc agg) instead of the naive three
    (df agg + gram join + doc agg).  No collect, no broadcast of the
    vocabulary (it is corpus-sized).  Shares the word_shingles tokenizer
    with the dedup suite."""
    from azure_func_forem_data_etl_spark.operators.dedup import word_shingles

    docs = entity_table(spark, sf_dir, "documents")
    g = word_shingles(docs, NOVELTY_NGRAM, text_col="text").withColumnRenamed(
        "shingle", "gram"
    )
    wg = Window.partitionBy("gram")
    with_df = g.withColumn("df", F.count("*").over(wg))
    novel = F.when(F.col("df") < NOVELTY_COMMON_DF, 1).otherwise(0)
    return (
        with_df.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
        )
        .withColumn(
            "novelty", F.col("n_novel").cast("double") / F.col("n_grams")
        )
    )


@register(
    "char_class_entropy",
    oracle="""
    WITH c AS (
        SELECT doc_id,
               length(text) AS n,
               length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(regexp_replace(text, '[^ ]', '', 'g')) AS n_space
        FROM documents WHERE length(text) > 0
    ),
    f AS (
        SELECT doc_id, n, n_alpha, n_digit, n_space,
               n - n_alpha - n_digit - n_space AS n_other
        FROM c
    )
    SELECT doc_id, n_alpha, n_digit, n_space, n_other,
           -- + 0.0 normalizes IEEE negative zero: a single-class doc
           -- (r11 long-docs sweep: one unbroken all-alpha token) makes
           -- every term 0, and negating the sum yields -0.0 here while
           -- Spark's round emits +0.0; x + 0.0 is the identity for every
           -- other value
           round(- (CASE WHEN n_alpha = 0 THEN 0.0
                   ELSE (CAST(n_alpha AS DOUBLE) / n) * log2(CAST(n_alpha AS DOUBLE) / n) END
            + CASE WHEN n_digit = 0 THEN 0.0
                   ELSE (CAST(n_digit AS DOUBLE) / n) * log2(CAST(n_digit AS DOUBLE) / n) END
            + CASE WHEN n_space = 0 THEN 0.0
                   ELSE (CAST(n_space AS DOUBLE) / n) * log2(CAST(n_space AS DOUBLE) / n) END
            + CASE WHEN n_other = 0 THEN 0.0
                   ELSE (CAST(n_other AS DOUBLE) / n) * log2(CAST(n_other AS DOUBLE) / n) END
           ), 9) + 0.0 AS class_entropy
    FROM f
    """,
    doc="Character-class entropy (alpha/digit/space/other Shannon "
    "entropy per doc): the cheap gibberish/encoded-blob detector — "
    "natural text sits near ~1.2-1.5 bits, base64 blobs and digit "
    "dumps collapse toward 0-1.",
)
def char_class_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure map-side: four regexp_replace length counts + closed-form
    entropy, all inside whole-stage codegen — no shuffle at any scale.
    Expression tree (p·log2 p per class, zero-guarded) mirrors the
    oracle exactly for bit-identical doubles."""
    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.length("text")
    n_alpha = F.length(F.regexp_replace("text", "[^a-z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    n_space = F.length(F.regexp_replace("text", "[^ ]", ""))
    c = docs.select(
        "doc_id",
        n.alias("n"),
        n_alpha.alias("n_alpha"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
    ).withColumn(
        "n_other",
        F.col("n") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space"),
    )

    def term(col: str):
        p = F.col(col).cast("double") / F.col("n")
        return F.when(F.col(col) == 0, F.lit(0.0)).otherwise(p * F.log2(p))

    return c.select(
        "doc_id",
        "n_alpha",
        "n_digit",
        "n_space",
        "n_other",
        (
            F.round(
                -(term("n_alpha") + term("n_digit") + term("n_space") + term("n_other")),
                9,  # JVM log vs libm log2 differ in the last ulp
            )
            + F.lit(0.0)  # -0.0 -> +0.0, mirroring the oracle (see note)
        ).alias("class_entropy"),
    )


@register(
    "bigram_lm_score",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, {SQL_SPLIT_FOLDED} AS ts
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i + 1])) AS bgs
        FROM toks
        WHERE len(ts) >= 2
    ),
    cb AS (SELECT bgs, COUNT(*) AS c12 FROM bg GROUP BY bgs),
    cw AS (
        SELECT split_part(bgs, ' ', 1) AS w1, COUNT(*) AS c1
        FROM bg GROUP BY 1
    ),
    scored AS (
        SELECT bg.doc_id,
               CAST(round(log10(cb.c12 / CAST(cw.c1 AS DOUBLE)), 4)
                    AS DECIMAL(18,4)) AS logp
        FROM bg
        JOIN cb USING (bgs)
        JOIN cw ON split_part(bg.bgs, ' ', 1) = cw.w1
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(logp) AS DOUBLE) AS sum_log10_prob
    FROM scored GROUP BY doc_id
    """,
    doc="Bigram-LM fluency score: per doc, the sum of log10 P(w2|w1) "
    "under the corpus's own bigram model (decimal-domain sum); the "
    "conditional-probability step up from unigram_logprob_score.",
)
def bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order language-model scoring (CCNet-style fluency, one
    order up from ``unigram_logprob_score``): P(w2|w1) = c(w1 w2) /
    c(w1 ·), both counted over the corpus's own bigram stream, so every
    doc bigram has nonzero probability by construction (no smoothing
    needed) and the whole computation is oracle-exact.

    Scale shape: ONE explode pass into the bigram stream feeds the
    bigram-count table, the prefix-count table, and the scoring join;
    both count tables are vocabulary-sized (≪ corpus) and BROADCAST, so
    the stream shuffles only for the final per-doc aggregation.  Per-
    bigram logs are quantized at 4dp into DECIMAL (associative-exact sum
    — partition-order- and engine-independent), same discipline as the
    unigram scorer."""
    docs = table(spark, sf_dir, "documents")
    ts = F.split(ascii_fold("text"), WS_RE)
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
            ).alias("bgs"),
        )
    )
    # r13 optimization (guide §2.3): the prefix-count table derives from
    # the bigram-count table (c1 = Σ_w2 c12 — every w1-occurrence in the
    # stream is the prefix of exactly one bigram), deleting the third
    # full explode + stream-wide w1 aggregation, and log10 runs once per
    # bigram TYPE (precomputed logp attached by the scoring join) instead
    # of once per stream row.  The stream still explodes twice — the
    # single-explode (doc, bgs) aggregation variant traded those map-only
    # passes for a corpus-sized shuffle and measured ×1.19 slower.
    cb = bg.groupBy("bgs").agg(F.count("*").alias("c12"))
    cw = (
        cb.groupBy(F.substring_index("bgs", " ", 1).alias("w1"))
        .agg(F.sum("c12").alias("c1"))
    )
    score = (
        cb.join(
            broadcast_derived(cw, sf_dir, "documents"),
            F.substring_index(F.col("bgs"), " ", 1) == F.col("w1"),
        )
        .select(
            "bgs",
            F.round(
                F.log10(F.col("c12") / F.col("c1").cast("double")), 4
            )
            .cast("decimal(18,4)")
            .alias("logp"),
        )
    )
    # |bigram-type|-sized score table: hint gated on source size (r14 #7)
    scored = bg.join(broadcast_derived(score, sf_dir, "documents"), "bgs")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("logp").cast("double").alias("sum_log10_prob"),
    )


def _compression_ratio_fn(texts):
    """Vectorized zlib compression ratio per doc (Arrow batch in/out).
    Wrapped with ``pandas_udf`` at call time — executors re-import this
    module in UDF workers where no session exists to parse DDL types."""
    import zlib

    import numpy as np
    import pandas as pd

    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        raw = (t or "").encode("utf-8")
        out[i] = (len(zlib.compress(raw, 6)) / len(raw)) if raw else 1.0
    return pd.Series(out)


@register(
    "compression_ratio_quality",
    # No oracle: the ratio is zlib-bound and DuckDB 1.0 ships no
    # zlib/deflate SQL function, so the compressed size cannot be
    # regenerated relationally; ratio-range and verdict-boundary
    # invariants are unit-tested instead.
    oracle=None,
    doc="Gopher-style compression-ratio quality signal: zlib bytes-out / "
    "bytes-in per doc (low ratio = repetitive boilerplate, ~1 = "
    "high-entropy gibberish), via an Arrow-vectorized pandas_udf.",
)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compressibility filter from public corpus-quality methodology
    (Gopher/MassiveText rules, also used by RefinedWeb): natural prose
    compresses to a mid ratio; templated/repeated text compresses far
    lower; random noise barely compresses.  Both tails get flagged.

    Scale shape: map-only over Arrow batches (the ONE family where Python
    is justified — zlib is not expressible in Catalyst); no shuffle; CPU
    scales with corpus bytes and parallelizes embarrassingly."""
    from pyspark.sql.functions import pandas_udf

    ratio = pandas_udf(_compression_ratio_fn, "double")
    docs = table(spark, sf_dir, "documents")
    r = ratio(F.col("text"))
    return docs.select(
        "doc_id",
        "n_chars",
        F.round(r, 6).alias("compression_ratio"),
        (
            F.when(F.round(r, 6) < 0.35, "too_repetitive")
            .when(F.round(r, 6) > 0.95, "too_random")
            .otherwise("ok")
        ).alias("verdict"),
    )


from azure_func_forem_data_etl_spark.plans.registry import REGISTRY as _REG


@register(
    "lang_id_confusion_matrix",
    oracle=f"""
    WITH l AS ({_REG["lang_id_markers"].oracle})
    SELECT actual_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) / CAST(sum(count(*)) OVER (
               PARTITION BY actual_lang) AS DOUBLE), 6) AS share_of_actual
    FROM l
    GROUP BY actual_lang, predicted_lang
    """,
    doc="Language-ID quality report: actual x predicted confusion counts "
    "with per-actual-language shares (recall on the diagonal).",
)
def lang_id_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evaluation layer on top of ``lang_id_markers`` — the report a
    curation team reads before trusting the detector's language routing.
    Diagonal shares are per-language recall; off-diagonal cells show
    which language pairs confuse the marker heuristic.

    Scale shape: composes the map-only detector with one aggregation on
    a (langs x langs)-cardinality key, then a window over that tiny
    rollup — the corpus is scanned once and shuffles only per-cell
    partial counts."""
    l = lang_id_markers(spark, sf_dir)
    from pyspark.sql import Window

    counts = l.groupBy("actual_lang", "predicted_lang").agg(
        F.count("*").alias("n_docs")
    )
    tot = F.sum("n_docs").over(Window.partitionBy("actual_lang"))
    return counts.select(
        "actual_lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / tot.cast("double"), 6).alias(
            "share_of_actual"
        ),
    )


PMI_MIN_PAIR_COUNT = 20  # ignore rare pairs: PMI is noise at low counts


@register(
    "collocation_pmi",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, {SQL_SPLIT_FOLDED} AS ts
        FROM documents
    ),
    bg AS (
        SELECT unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS p
        FROM toks WHERE len(ts) >= 2
    ),
    pairs AS (
        SELECT p.w1 AS w1, p.w2 AS w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(c12) AS t FROM pairs),
    lefts AS (SELECT w1, SUM(c12) AS c1 FROM pairs GROUP BY w1),
    rights AS (SELECT w2, SUM(c12) AS c2 FROM pairs GROUP BY w2)
    SELECT p.w1, p.w2, CAST(p.c12 AS BIGINT) AS c12,
           round(log10((p.c12 * t.t) /
                       (CAST(l.c1 AS DOUBLE) * r.c2)), 6) AS pmi
    FROM pairs p
    JOIN lefts l USING (w1)
    JOIN rights r USING (w2)
    CROSS JOIN tot t
    WHERE p.c12 >= {PMI_MIN_PAIR_COUNT}
    """,
    doc=f"Collocation extraction: pointwise mutual information of "
    f"adjacent word pairs (>= {PMI_MIN_PAIR_COUNT} occurrences), from "
    "one bigram scan feeding pair/left/right marginals.",
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations — the classic corpus-linguistics signal for
    multiword expressions (high PMI = the pair co-occurs far above
    chance), used in tokenizer-vocabulary and phrase-mining pipelines.

    Scale shape: ONE bigram aggregation; both marginals and the total
    derive from the (vocabulary²-bounded) pair-count table, not from the
    corpus, and broadcast back into the scoring join.  The count floor
    keeps the output to statistically meaningful pairs."""
    docs = table(spark, sf_dir, "documents")
    ts = F.split(ascii_fold("text"), WS_RE)
    bg = (
        docs.select(ts.alias("ts"))
        .filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ts") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("ts"), i).alias("w1"),
                        F.element_at(F.col("ts"), i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    pairs = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    tot = pairs.agg(F.sum("c12").alias("t"))
    lefts = pairs.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rights = pairs.groupBy("w2").agg(F.sum("c12").alias("c2"))
    return (
        pairs.filter(F.col("c12") >= PMI_MIN_PAIR_COUNT)
        .join(broadcast_derived(lefts, sf_dir, "documents"), "w1")
        .join(broadcast_derived(rights, sf_dir, "documents"), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log10(
                    (F.col("c12") * F.col("t"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )


#: Lexicons drawn from the corpus vocabulary so scores are exercised;
#: a real deployment loads AFINN/VADER-style lists the same way.
SENTIMENT_POS = ("fast", "big")
SENTIMENT_NEG = ("slow", "small")


@register(
    "sentiment_lexicon_score",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id,
               {SQL_SPLIT_FOLDED} AS ws
        FROM documents
    )
    SELECT doc_id,
           CAST(n_pos AS INT) AS n_pos,
           CAST(n_neg AS INT) AS n_neg,
           round((n_pos - n_neg) / CAST(len(ws) AS DOUBLE), 6) AS polarity
    FROM (
        SELECT doc_id, ws,
               len(list_filter(ws, x -> x IN {SENTIMENT_POS})) AS n_pos,
               len(list_filter(ws, x -> x IN {SENTIMENT_NEG})) AS n_neg
        FROM w WHERE len(ws) > 0
    )
    """,
    doc="Lexicon sentiment scoring (EDBT'16 Twitter-at-scale family): "
    "positive/negative token hits and normalized polarity per doc, "
    "pure JVM array lambdas.",
)
def sentiment_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed-sentiment baseline (cf. \"Large Scale Sentiment
    Analysis on Twitter with Spark\", EDBT 2016): lexicon hit counts and
    a length-normalized polarity in [-1, 1].  The lexicon rides as a
    broadcast-free literal set inside the filter lambdas.

    Scale shape: map-only — token split, two array filters, one
    division; zero shuffles, embarrassingly parallel over corpus bytes."""
    docs = table(spark, sf_dir, "documents")
    ws = F.split(ascii_fold("text"), WS_RE)
    d = docs.select("doc_id", ws.alias("ws")).filter(F.size("ws") > 0)
    n_pos = F.size(
        F.filter(F.col("ws"), lambda x: x.isin(*SENTIMENT_POS))
    )
    n_neg = F.size(
        F.filter(F.col("ws"), lambda x: x.isin(*SENTIMENT_NEG))
    )
    return d.select(
        "doc_id",
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        F.round(
            (n_pos - n_neg) / F.size("ws").cast("double"), 6
        ).alias("polarity"),
    )


@register(
    "tokenizer_fertility_stats",
    oracle=f"""
    WITH t AS (
        SELECT lang,
               len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
               length(text) AS n_chars
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           -- a language with ZERO tokens (all-blank docs) has no
           -- chars-per-token: NULL, keeping the row's defined counts
           -- (r11 blank-docs sweep)
           CASE WHEN SUM(n_tokens) > 0 THEN
               round(SUM(n_chars) / SUM(n_tokens), 6) END AS chars_per_token,
           round(SUM(n_tokens) / COUNT(*), 6) AS tokens_per_doc
    FROM t GROUP BY lang
    """,
    doc="Tokenizer fertility per language: chars/token and tokens/doc under the BPE-ish pre-tokenizer.",
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility — how many characters one token 'costs' per language — is
    the standard lens for tokenizer equity across languages in an LLM
    corpus (high fertility = that language pays more tokens per unit of
    text).  One map-side tokenize + one small groupBy(lang): integer sums
    are exact, the two ratios are single bigint/bigint double divisions —
    bit-identical cross-engine.  At 100 TB this is a pure map-combine agg
    with a |langs|-row shuffle."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0))
    per_doc = docs.select(
        "lang",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        # zero-token language: chars/token undefined -> NULL (CASE-
        # guarded division; r11 blank-docs sweep)
        F.when(
            F.sum("n_tokens") > 0,
            F.round(F.sum("n_chars") / F.sum("n_tokens"), 6),
        ).alias("chars_per_token"),
        F.round(F.sum("n_tokens") / F.count("*"), 6).alias("tokens_per_doc"),
    )


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (QL-Dirichlet)

QL_QUERY_TERMS = ("spark", "window", "stream")
QL_MU = 200
QL_TOP = 50


@register(
    "ql_dirichlet_topk",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM w GROUP BY doc_id),
    coll AS (
        SELECT word, COUNT(*) AS cf FROM w
        WHERE word IN {QL_QUERY_TERMS} GROUP BY word
    ),
    tot AS (SELECT COUNT(*) AS t FROM w),
    tf AS (
        SELECT doc_id, word, COUNT(*) AS tf FROM w
        WHERE word IN {QL_QUERY_TERMS} GROUP BY doc_id, word
    ),
    scored AS (
        SELECT dl.doc_id,
               CAST(round(log10(
                   (COALESCE(tf.tf, 0) + {QL_MU} * (coll.cf / CAST(tot.t AS DOUBLE)))
                   / (dl.dlen + {QL_MU})
               ), 4) AS DECIMAL(18,4)) AS logp
        FROM dl CROSS JOIN coll CROSS JOIN tot
        LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.word = coll.word
    ),
    agg AS (
        SELECT doc_id, CAST(SUM(logp) AS DOUBLE) AS ql_score FROM scored
        GROUP BY doc_id
    )
    SELECT doc_id, ql_score, rk FROM (
        SELECT doc_id, ql_score,
               CAST(row_number() OVER (ORDER BY ql_score DESC, doc_id) AS INT) AS rk
        FROM agg
    ) WHERE rk <= {QL_TOP}
    """,
    doc=f"Query-likelihood retrieval (Dirichlet smoothing, mu={QL_MU}): top-{QL_TOP} docs for a fixed query; the LM twin of bm25_topk_docs.",
)
def ql_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The language-modeling IR scorer (Zhai & Lafferty): score(d) =
    sum_q log p(q|d) with Dirichlet-smoothed p(q|d) =
    (tf + mu*cf/|C|) / (dl + mu).  Completes the retrieval family
    (TF-IDF, BM25, unigram/bigram LM): BM25 rewards saturating tf,
    QL-Dirichlet normalizes by document length through the smoothing
    denominator.

    Determinism: per-(doc, term) log10 quantized at 4dp then summed in
    the decimal domain (same associativity trick as unigram_logprob).
    Scale shape: collection stats prune to the query terms BEFORE any
    shuffle (|terms| rows broadcast); doc lengths are one map-combine
    agg; every doc scores every query term via the broadcast cross join
    (|docs| x |terms| rows, fanout 3) with tf left-joined on top."""
    terms = list(QL_QUERY_TERMS)
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    dl = w.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    qw = w.filter(F.col("word").isin(terms))
    coll = qw.groupBy("word").agg(F.count("*").alias("cf"))
    tot = w.agg(F.count("*").alias("t"))
    tf = qw.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    p = (
        (F.coalesce(F.col("tf"), F.lit(0))
         + F.lit(QL_MU) * (F.col("cf") / F.col("t").cast("double")))
        / (F.col("dlen") + F.lit(QL_MU))
    )
    scored = (
        dl.crossJoin(F.broadcast(coll))
        .crossJoin(F.broadcast(tot))
        .join(tf, ["doc_id", "word"], "left")
        .withColumn("logp", F.round(F.log10(p), 4).cast("decimal(18,4)"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("logp").cast("double").alias("ql_score")
    )
    rk = F.row_number().over(Window.orderBy(F.desc("ql_score"), F.asc("doc_id")))
    return (
        agg.withColumn("rk", rk.cast("int"))
        .filter(F.col("rk") <= QL_TOP)
        .select("doc_id", "ql_score", "rk")
    )


ZIPF_TOP_RANKS = 100


@register(
    "zipf_exponent_fit",
    oracle=rf"""
    WITH w AS (
        SELECT UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
    top AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rnk
        FROM (SELECT * FROM freq ORDER BY cnt DESC, word LIMIT {ZIPF_TOP_RANKS})
    ),
    pts AS (
        SELECT CAST(round(log10(rnk), 4) AS DECIMAL(18,4)) AS x,
               CAST(round(log10(cnt), 4) AS DECIMAL(18,4)) AS y
        FROM top
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx
        FROM pts
    )
    SELECT n AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS log10_intercept
    FROM s
    -- degenerate contract (r11 blank-docs sweep): the OLS fit needs at
    -- least two distinct ranks (a 1-word vocabulary has zero x-variance)
    -- — no rows on BOTH engines
    WHERE n * sxx - sx * sx > 0
    """,
    doc=f"Zipf's-law fit over the top-{ZIPF_TOP_RANKS} word ranks: OLS slope of log10(freq) vs log10(rank); natural corpora fit slope ~ -1.",
)
def zipf_exponent_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics health check: natural language follows Zipf's law
    (freq ∝ rank^-s, s≈1); big deviations flag templated/synthetic text.
    The rank table is bounded by TakeOrdered (orderBy+limit — only
    ZIPF_TOP_RANKS rows ever sort globally); per-point log10 values are
    4dp-quantized then all OLS sums run in the decimal domain, so the
    closed-form slope is one deterministic double expression at the end.
    Scale: one explode + one vocab agg + a 100-row fit."""
    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("cnt"))
    top = (
        freq.orderBy(F.desc("cnt"), F.asc("word"))
        .limit(ZIPF_TOP_RANKS)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("word"))),
        )
    )
    pts = top.select(
        F.round(F.log10("rnk"), 4).cast("decimal(18,4)").alias("x"),
        F.round(F.log10("cnt"), 4).cast("decimal(18,4)").alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # degenerate contract (see oracle): a 1-word vocabulary has zero
    # x-variance; the filter precedes the OLS projection
    return s.filter(n * sxx - sx * sx > 0).select(
        n.alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("log10_intercept"),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 (lexical) x embedding cosine (semantic), RRF-fused

HYBRID_QUERY_VEC = 0   # the embedding playing "query" in the semantic leg
HYBRID_RRF_K = 60      # standard RRF dampening constant
HYBRID_TOP = 20

from azure_func_forem_data_etl_spark.plans.registry import REGISTRY as _REG  # noqa: E402
from azure_func_forem_data_etl_spark.operators.similarity import (  # noqa: E402
    sql_cosine_domain,
)


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH bm AS ({{bm25}}),
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
                   AS r_lex
        FROM bm
    ),
    q AS (
        SELECT embedding::DOUBLE[] AS qe FROM embeddings
        WHERE vec_id = {HYBRID_QUERY_VEC}
          AND {{cosdom}}
    ),
    sem0 AS (
        SELECT vec_id AS doc_id,
               round(list_cosine_similarity(embedding::DOUBLE[], q.qe), 6)
                   AS cos_sim
        FROM embeddings CROSS JOIN q
        WHERE vec_id <> {HYBRID_QUERY_VEC}
          -- cosine domain (r13 specials sweep): out-of-domain vectors
          -- produce NaN cosines on Spark but a silent -1 from DuckDB's
          -- list_cosine_similarity — exclude them identically instead
          AND {{cosdom}}
    ),
    sem AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS INT)
                   AS r_sem
        FROM (SELECT * FROM sem0 ORDER BY cos_sim DESC, doc_id LIMIT 50)
    ),
    fused AS (
        SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
               lex.r_lex, sem.r_sem,
               round(COALESCE(1.0 / ({HYBRID_RRF_K} + lex.r_lex), 0.0)
                     + COALESCE(1.0 / ({HYBRID_RRF_K} + sem.r_sem), 0.0), 6)
                   AS rrf_score
        FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
    )
    SELECT doc_id, r_lex, r_sem, rrf_score, rk FROM (
        SELECT fused.*,
               CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
                   AS rk
        FROM fused
    ) WHERE rk <= {HYBRID_TOP}
    """.format(
        bm25=_REG["bm25_topk_docs"].oracle,
        cosdom=sql_cosine_domain("embedding::DOUBLE[]"),
    ),
    doc=f"Hybrid retrieval: BM25 lexical ranks x embedding-cosine semantic ranks fused by Reciprocal Rank Fusion (k={HYBRID_RRF_K}), top-{HYBRID_TOP}.",
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAG-stack retrieval composition: lexical BM25 catches exact
    terminology, the embedding index catches paraphrase, and Reciprocal
    Rank Fusion (Cormack et al. 2009) merges them using only RANKS —
    robust to the two scorers' incomparable scales.  Each leg's rank list
    is top-k-bounded (TakeOrdered) before the fuse, so the full-outer
    fusion join touches ≤100 rows no matter the corpus size; per-doc RRF
    is a two-term sum of exact reciprocals (deterministic IEEE).  At
    100 TB each leg is independently the scale path already audited
    (BM25: query-term-pruned aggs; semantic: swap brute-force cosine for
    the ANN tiers)."""
    from azure_func_forem_data_etl_spark.operators.similarity import (
        cosine_expr,
        nonzero_norm,
    )

    bm = bm25_topk_docs(spark, sf_dir)
    lex = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .cast("int")
        .alias("r_lex"),
    )
    # cosine domain on both legs (r13 specials sweep; oracle mirrors):
    # zero-norm and NaN/Inf vectors are outside the semantic scorer
    emb = (
        table(spark, sf_dir, "embeddings")
        .filter(nonzero_norm("embedding"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    )
    q = emb.filter(F.col("vec_id") == HYBRID_QUERY_VEC).select(
        F.col("e").alias("qe")
    )
    sem0 = (
        emb.filter(F.col("vec_id") != HYBRID_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr("e", "qe"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(50)
    )
    sem = sem0.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), F.asc("doc_id")))
        .cast("int")
        .alias("r_sem"),
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_lex",
            "r_sem",
            F.round(
                F.coalesce(F.lit(1.0) / (HYBRID_RRF_K + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (HYBRID_RRF_K + F.col("r_sem")), F.lit(0.0)),
                6,
            ).alias("rrf_score"),
        )
    )
    rk = F.row_number().over(Window.orderBy(F.desc("rrf_score"), F.asc("doc_id")))
    return (
        fused.withColumn("rk", rk.cast("int"))
        .filter(F.col("rk") <= HYBRID_TOP)
    )


@register(
    "readability_flesch",
    oracle=rf"""
    WITH m AS (
        SELECT doc_id,
               len(regexp_extract_all({SQL_FOLD_TEXT}, '[a-z0-9]+')) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               len(regexp_extract_all({SQL_FOLD_TEXT}, '[aeiouy]+'))
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           -- shortest-repr rounding (sql_dround): plain round(x, 4)
           -- rounds the SCALED double and flips the last digit when
           -- x*10^4 lands exactly on .5 (r11 long-docs sweep: a 4000-
           -- word single-sentence doc scores -3973.06434999999965)
           CAST(CAST(CAST(206.835
                 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                 - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)
               AS STRING) AS DECIMAL(38,4)) AS DOUBLE) AS flesch_score
    FROM m WHERE n_words > 0
    """,
    doc="Flesch reading-ease per doc from regex word/sentence/vowel-group counts; identical IEEE formula tree on both engines.",
)
def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring — the classic text-quality feature set next to
    stopword/repetition ratios in LLM curation filters (C4 drops
    low-readability boilerplate).  Words, sentences, and syllables are
    all regex-count heuristics (vowel groups ≈ syllables) shared verbatim
    with the oracle; the Flesch formula is pure double arithmetic on
    exact counts — one map-only pass, no shuffle at all."""
    docs = table(spark, sf_dir, "documents")
    n_words = F.size(F.regexp_extract_all(ascii_fold("text"), F.lit("[a-z0-9]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    )
    n_syll = F.size(F.regexp_extract_all(ascii_fold("text"), F.lit("[aeiouy]+"), 0))
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return m.withColumn(
        "flesch_score",
        dround(
            206.835
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - 84.6 * (F.col("n_syllables").cast("double") / F.col("n_words")),
            4,
        ),
    )


@register(
    "eval_cohens_kappa",
    oracle=f"""
    WITH pred AS (
        SELECT {_LANG_CASE_SQL} AS predicted_lang, lang AS actual_lang
        FROM (
            SELECT lang,
                   {_sql_hits(LANG_MARKERS['en'])} AS s_en,
                   {_sql_hits(LANG_MARKERS['fr'])} AS s_fr,
                   {_sql_hits(LANG_MARKERS['es'])} AS s_es,
                   {_sql_hits(LANG_MARKERS['de'])} AS s_de
            FROM (SELECT lang, string_split(text, ' ') AS words FROM documents)
        )
    ),
    cells AS (
        SELECT predicted_lang, actual_lang, COUNT(*) AS n
        FROM pred GROUP BY 1, 2
    ),
    stats AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COALESCE(SUM(n) FILTER (
                   WHERE predicted_lang = actual_lang), 0) AS BIGINT) AS agree
        FROM cells
    ),
    expected AS (
        SELECT CAST(SUM(rp.np * ca.na) AS BIGINT) AS exp_agree
        FROM (SELECT predicted_lang AS l, SUM(n) AS np FROM cells GROUP BY 1) rp
        JOIN (SELECT actual_lang AS l, SUM(n) AS na FROM cells GROUP BY 1) ca
          USING (l)
    )
    SELECT n_docs, agree,
           round(agree / CAST(n_docs AS DOUBLE), 6) AS po,
           round(exp_agree / (CAST(n_docs AS DOUBLE) * n_docs), 6) AS pe,
           round((agree * n_docs - exp_agree)
                 / CAST(n_docs * n_docs - exp_agree AS DOUBLE), 6) AS kappa
    FROM stats, expected
    """,
    doc="Cohen's kappa of the marker lang-ID against true labels: "
    "chance-corrected agreement from the confusion marginals.",
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected inter-rater agreement between the lang-ID detector
    and the ground-truth labels — the right summary when classes are
    imbalanced (raw accuracy is inflated by the majority language).

    Numerical determinism: kappa is computed as the single integer-exact
    ratio (agree*n - exp) / (n^2 - exp) instead of (po-pe)/(1-pe), so
    both engines divide the same two integers once — no intermediate
    float drift.

    Scale shape: reuses the map-only detector, aggregates to a
    (langs x langs) cell table, and every downstream join/agg runs on
    that constant-size table; the corpus is scanned exactly once.
    """
    cells = (
        lang_id_markers(spark, sf_dir)
        .groupBy("predicted_lang", "actual_lang")
        .agg(F.count("*").alias("n"))
    )
    stats = cells.agg(
        F.sum("n").alias("n_docs"),
        F.coalesce(
            F.sum(F.when(F.col("predicted_lang") == F.col("actual_lang"), F.col("n"))),
            F.lit(0),
        ).alias("agree"),
    )
    rp = cells.groupBy(F.col("predicted_lang").alias("l")).agg(F.sum("n").alias("np"))
    ca = cells.groupBy(F.col("actual_lang").alias("l")).agg(F.sum("n").alias("na"))
    expected = rp.join(ca, "l").agg(F.sum(F.col("np") * F.col("na")).alias("exp_agree"))
    s = stats.crossJoin(F.broadcast(expected))
    return s.select(
        "n_docs",
        "agree",
        F.round(F.col("agree") / F.col("n_docs").cast("double"), 6).alias("po"),
        F.round(
            F.col("exp_agree") / (F.col("n_docs").cast("double") * F.col("n_docs")), 6
        ).alias("pe"),
        F.round(
            (F.col("agree") * F.col("n_docs") - F.col("exp_agree"))
            / (F.col("n_docs") * F.col("n_docs") - F.col("exp_agree")).cast("double"),
            6,
        ).alias("kappa"),
    )


#: Log-odds: Dirichlet prior total pseudo-count and report size.
LOGODDS_ALPHA0 = 500.0
LOGODDS_TOP_N = 15


@register(
    "text_log_odds_terms",
    oracle=f"""
    WITH toks AS (
        SELECT CAST(lang = 'en' AS INT) AS grp, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    counts AS (
        SELECT w,
               CAST(SUM(grp) AS BIGINT) AS y_a,
               CAST(SUM(1 - grp) AS BIGINT) AS y_b
        FROM toks WHERE w <> '' GROUP BY w
    ),
    tot AS (
        SELECT SUM(y_a) AS n_a, SUM(y_b) AS n_b, SUM(y_a + y_b) AS n_all
        FROM counts
    ),
    z AS (
        SELECT w, y_a, y_b,
               ln((y_a + {LOGODDS_ALPHA0} * (y_a + y_b) / CAST(n_all AS DOUBLE))
                  / (n_a - y_a + {LOGODDS_ALPHA0}
                     * (1.0 - (y_a + y_b) / CAST(n_all AS DOUBLE))))
               - ln((y_b + {LOGODDS_ALPHA0} * (y_a + y_b) / CAST(n_all AS DOUBLE))
                    / (n_b - y_b + {LOGODDS_ALPHA0}
                       * (1.0 - (y_a + y_b) / CAST(n_all AS DOUBLE)))) AS delta,
               1.0 / (y_a + {LOGODDS_ALPHA0} * (y_a + y_b) / CAST(n_all AS DOUBLE))
               + 1.0 / (y_b + {LOGODDS_ALPHA0} * (y_a + y_b) / CAST(n_all AS DOUBLE))
                   AS variance
        FROM counts, tot
    )
    SELECT w AS term, y_a, y_b,
           round(delta / sqrt(variance), 6) AS z_score
    FROM z
    ORDER BY abs(delta / sqrt(variance)) DESC, term
    LIMIT {LOGODDS_TOP_N}
    """,
    doc=f"Monroe weighted log-odds (informative Dirichlet prior): top-"
    f"{LOGODDS_TOP_N} terms most associated with either side of the "
    "en-vs-rest corpus split, by |z|.",
)
def text_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'What words distinguish corpus A from corpus B?' answered the
    statistically-sound way (Monroe, Colaresi & Quinn 2008, "Fightin'
    Words"): log-odds-ratio with an informative Dirichlet prior drawn
    from the pooled counts, z-scored by the delta's variance — raw
    frequency ratios over-rank rare words; the prior shrinks them.

    Scale shape: one corpus scan -> token explode -> per-term (y_a, y_b)
    aggregation (vocabulary-bounded, sublinear); totals join back as a
    1-row broadcast; TakeOrdered top-N. No Python anywhere.
    """
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        (F.col("lang") == "en").cast("int").alias("grp"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    counts = toks.groupBy("w").agg(
        F.sum("grp").alias("y_a"), F.sum(1 - F.col("grp")).alias("y_b")
    )
    tot = counts.agg(
        F.sum("y_a").alias("n_a"),
        F.sum("y_b").alias("n_b"),
        F.sum(F.col("y_a") + F.col("y_b")).alias("n_all"),
    )
    c = counts.crossJoin(F.broadcast(tot))
    pooled_share = (F.col("y_a") + F.col("y_b")) / F.col("n_all").cast("double")
    alpha_w = LOGODDS_ALPHA0 * pooled_share
    alpha_rest = LOGODDS_ALPHA0 * (1.0 - pooled_share)
    delta = F.log(
        (F.col("y_a") + alpha_w) / (F.col("n_a") - F.col("y_a") + alpha_rest)
    ) - F.log((F.col("y_b") + alpha_w) / (F.col("n_b") - F.col("y_b") + alpha_rest))
    variance = 1.0 / (F.col("y_a") + alpha_w) + 1.0 / (F.col("y_b") + alpha_w)
    z = delta / F.sqrt(variance)
    return (
        c.select(
            F.col("w").alias("term"),
            "y_a",
            "y_b",
            F.round(z, 6).alias("z_score"),
            F.abs(z).alias("__absz"),
        )
        .orderBy(F.col("__absz").desc(), "term")
        .limit(LOGODDS_TOP_N)
        .drop("__absz")
    )


#: Fixed logistic gate weights over the three quality features (a stand-in
#: for a fasttext-style trained classifier's coefficients; swapping in
#: trained weights changes only these constants, not the plan).
GATE_W = (2.0, 1.5, 1.0)  # stopword_ratio, capped length, distinct fraction
GATE_B = -2.0
GATE_THRESHOLD = 0.5


@register(
    "quality_logreg_gate",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               {_sql_hits(STOPWORDS)} / CAST(len(words) AS DOUBLE)
                   AS f_stop,
               least(len(words) / 100.0, 1.0) AS f_len,
               len(list_distinct(words)) / CAST(len(words) AS DOUBLE) AS f_uniq
        FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
        WHERE len(words) > 0
    )
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-({GATE_W[0]} * f_stop + {GATE_W[1]} * f_len
                 + {GATE_W[2]} * f_uniq + {GATE_B}))), 6) AS keep_prob,
           CAST(1.0 / (1.0 + exp(-({GATE_W[0]} * f_stop + {GATE_W[1]} * f_len
                + {GATE_W[2]} * f_uniq + {GATE_B}))) >= {GATE_THRESHOLD}
               AS INT) AS keep
    FROM feats
    """,
    doc="Logistic quality gate: fixed-weight linear model over the quality "
    "features, sigmoid score + keep decision per doc (the fasttext-style "
    "classifier gate shape).",
)
def quality_logreg_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier-gate step of a curation funnel as an ENGINE operator:
    model scoring is a row-local linear expression, so a trained quality
    classifier (CCNet/fasttext-style) runs inside whole-stage codegen at
    scan bandwidth — no UDF, no model server.  Weights here are fixed
    constants; a real deployment broadcasts its coefficient vector and
    generates the same expression.

    Scale shape: pure map over documents — zero shuffles, prunes to the
    two columns it reads.
    """
    docs = table(spark, sf_dir, "documents")
    d = docs.withColumn("words", F.split("text", " ")).filter(F.size("words") > 0)
    f_stop = _hits("words", STOPWORDS) / F.size("words").cast("double")
    f_len = F.least(F.size("words") / 100.0, F.lit(1.0))
    f_uniq = F.size(F.array_distinct("words")) / F.size("words").cast("double")
    lin = GATE_W[0] * f_stop + GATE_W[1] * f_len + GATE_W[2] * f_uniq + F.lit(GATE_B)
    prob = 1.0 / (1.0 + F.exp(-lin))
    return d.select(
        "doc_id",
        F.round(prob, 6).alias("keep_prob"),
        (prob >= GATE_THRESHOLD).cast("int").alias("keep"),
    )


FIM_MIN_CHARS = 60  # shorter docs train as plain left-to-right


@register(
    "fim_transform",
    oracle=f"""
    SELECT doc_id,
           '<PRE>' || substring(text, 1, CAST(floor(n_chars / 3) AS INT))
           || '<SUF>' || substring(text, CAST(floor(2 * n_chars / 3) AS INT) + 1)
           || '<MID>' || substring(text, CAST(floor(n_chars / 3) AS INT) + 1,
                                   CAST(floor(2 * n_chars / 3) AS INT)
                                   - CAST(floor(n_chars / 3) AS INT))
               AS psm_text,
           CAST(floor(n_chars / 3) AS BIGINT) AS prefix_len,
           CAST(floor(2 * n_chars / 3) AS BIGINT)
               - CAST(floor(n_chars / 3) AS BIGINT) AS middle_len
    FROM documents WHERE n_chars >= {FIM_MIN_CHARS}
    """,
    doc="Fill-in-the-middle (PSM) transform: split each doc into thirds "
    "and re-serialize as <PRE>prefix<SUF>suffix<MID>middle.",
)
def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIM data transform (Bavarian et al. 2022, "Efficient Training
    of Language Models to Fill in the Middle"): rewrite a fraction of
    training docs into prefix-suffix-middle order so the model learns
    infilling.  Deterministic third-point splits here; a production
    pipeline randomizes split points per doc (swap the thirds for
    hash-derived offsets — same plan, still engine-deterministic).

    Scale shape: pure row-local string surgery inside codegen — zero
    shuffles, scan-bandwidth-bound, exactly how a rewrite this hot must
    run at 100 TB.
    """
    docs = table(spark, sf_dir, "documents").filter(
        F.col("n_chars") >= FIM_MIN_CHARS
    )
    p1 = F.floor(F.col("n_chars") / 3).cast("int")
    p2 = F.floor(2 * F.col("n_chars") / 3).cast("int")
    prefix = F.substring(F.col("text"), 1, p1)
    middle = F.expr(
        "substring(text, CAST(floor(n_chars / 3) AS INT) + 1, "
        "CAST(floor(2 * n_chars / 3) AS INT) - CAST(floor(n_chars / 3) AS INT))"
    )
    suffix = F.expr("substring(text, CAST(floor(2 * n_chars / 3) AS INT) + 1)")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<PRE>"), prefix, F.lit("<SUF>"), suffix, F.lit("<MID>"), middle
        ).alias("psm_text"),
        p1.cast("long").alias("prefix_len"),
        (p2 - p1).cast("long").alias("middle_len"),
    )


# --- corpus-law fits and distributional divergences (round 7) --------------

#: Heaps'-law checkpoints: vocabulary size is sampled at this many evenly
#: spaced doc_id cutoffs (no cumulative window — each checkpoint is an
#: independent bounded aggregate, so the plan stays scale-safe).
HEAPS_CHECKPOINTS = 16


@register(
    "heaps_law_fit",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    firsts AS (SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word),
    dt AS (SELECT doc_id, COUNT(*) AS n_tok FROM w GROUP BY doc_id),
    mx AS (SELECT MAX(doc_id) AS max_id FROM dt),
    cp AS (
        -- k / 20.0 FIRST: ids are opaque int64s (r11 id-domain sweep)
        -- and max_id * k overflows near 2^62 on both engines; the
        -- double product is exact on every realistic id and identical
        -- cross-engine at the extremes
        SELECT CAST(floor(max_id * (k / {HEAPS_CHECKPOINTS}.0)) AS BIGINT) AS cut
        FROM mx, UNNEST(range(1, {HEAPS_CHECKPOINTS} + 1)) AS t(k)
        GROUP BY 1
    ),
    pts AS (
        -- populated cuts only: extreme-id grids (r11 id-domain sweep)
        -- leave cuts below every doc_id, where the Spark side's inner
        -- joins drop the cut and log10(0) would crash here
        SELECT c.cut,
               CAST(round(log10((SELECT CAST(SUM(n_tok) AS BIGINT) FROM dt
                                 WHERE doc_id <= c.cut)), 4)
                    AS DECIMAL(18,4)) AS x,
               CAST(round(log10((SELECT COUNT(*) FROM firsts
                                 WHERE first_doc <= c.cut)), 4)
                    AS DECIMAL(18,4)) AS y
        FROM cp c
        WHERE EXISTS (SELECT 1 FROM dt WHERE doc_id <= c.cut)
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx
        FROM pts
    )
    SELECT n AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS heaps_beta,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0
               AS log10_k
    FROM s
    -- degenerate contract (r11 id-domain sweep: extreme ids collapse the
    -- checkpoint grid to one populated cut): a zero-x-variance fit is
    -- undefined — no rows, both engines
    WHERE n * sxx - sx * sx > 0
    """,
    doc=f"Heaps'-law fit: OLS slope of log10(vocab) vs log10(tokens) at "
    f"{HEAPS_CHECKPOINTS} doc-id checkpoints; natural corpora fit beta in "
    "0.4-0.6.",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth law fit — the companion corpus-health check to
    zipf_exponent_fit: V(T) ~ k.T^beta for natural text, and a beta far
    from ~0.5 flags templated or synthetic drops.

    Scale shape: the cumulative (tokens, vocab) curve is NOT computed
    with a global running window.  Each word's FIRST doc (one agg) and
    each doc's token count (one agg) feed a broadcast join against
    {HEAPS_CHECKPOINTS} fixed doc-id cutoffs, so "vocab at cutoff" is a
    bounded re-aggregation — three corpus-grain aggs total, no sort.
    The OLS runs over the checkpoint rows in the same 4dp-quantized
    decimal domain as the Zipf fit.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    # materialize the two corpus rollups once: mx/toks/vocab re-reference
    # them and Spark does not reuse aggregation subplans across references
    firsts = (
        w.groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
        .localCheckpoint(eager=True)
    )
    dt = (
        w.groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"))
        .localCheckpoint(eager=True)
    )
    mx = dt.agg(F.max("doc_id").alias("max_id"))
    cp = (
        mx.select(
            F.explode(F.sequence(F.lit(1), F.lit(HEAPS_CHECKPOINTS))).alias("k"),
            "max_id",
        )
        .select(
            # k / 20.0 first — see the oracle note (id-domain contract)
            F.floor(
                F.col("max_id") * (F.col("k") / F.lit(float(HEAPS_CHECKPOINTS)))
            ).alias("cut")
        )
        .distinct()
    )
    toks = (
        dt.crossJoin(F.broadcast(cp))
        .filter(F.col("doc_id") <= F.col("cut"))
        .groupBy("cut")
        .agg(F.sum("n_tok").alias("t"))
    )
    vocab = (
        firsts.crossJoin(F.broadcast(cp))
        .filter(F.col("first_doc") <= F.col("cut"))
        .groupBy("cut")
        .agg(F.count("*").alias("v"))
    )
    pts = toks.join(vocab, "cut").select(
        F.round(F.log10("t"), 4).cast("decimal(18,4)").alias("x"),
        F.round(F.log10("v"), 4).cast("decimal(18,4)").alias("y"),
    )
    s = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    # + 0.0 normalizes IEEE -0.0 to 0.0 (the synthetic corpus saturates
    # its vocabulary early, so the slope can be exactly zero — and the two
    # engines disagree on its sign bit otherwise).
    # degenerate contract (see oracle): zero x-variance => no rows; the
    # filter precedes the slope projection so ANSI never divides by 0
    return s.filter(n * sxx - sx * sx > 0).select(
        n.alias("n_points"),
        (F.round(slope, 6) + 0.0).alias("heaps_beta"),
        (F.round((sy - slope * sx) / n, 6) + 0.0).alias("log10_k"),
    )


@register(
    "js_divergence_langs",
    oracle=rf"""
    WITH w AS (
        SELECT lang, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    lw AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS c_lw
           FROM w GROUP BY 1, 2),
    wt AS (SELECT word, CAST(SUM(c_lw) AS BIGINT) AS c_w FROM lw GROUP BY 1),
    lt AS (SELECT lang, CAST(SUM(c_lw) AS BIGINT) AS c_l FROM lw GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_w) AS BIGINT) AS c FROM wt),
    -- every (lang, word-in-union-vocab) cell: q-side mass exists even
    -- where the lang itself never uses the word
    cells AS (
        SELECT l.lang, wt.word, COALESCE(lw.c_lw, 0) AS c_lw,
               wt.c_w, l.c_l, t.c
        FROM lt l CROSS JOIN wt
        CROSS JOIN tot t
        LEFT JOIN lw ON lw.lang = l.lang AND lw.word = wt.word
        -- degenerate contract (r11 single-row sweep): a language that IS
        -- the whole corpus has no "rest" to diverge from (c - c_l = 0) —
        -- it emits no rows on BOTH engines
        WHERE l.c_l < t.c
    ),
    contrib AS (
        SELECT lang,
               CAST(CASE WHEN c_lw > 0 THEN
                 round((c_lw / CAST(c_l AS DOUBLE))
                       * log2((c_lw / CAST(c_l AS DOUBLE))
                              / ((c_lw / CAST(c_l AS DOUBLE)
                                  + (c_w - c_lw) / CAST(c - c_l AS DOUBLE)) / 2)),
                       10)
               ELSE 0 END AS DECIMAL(18,10)) AS p_term,
               CAST(CASE WHEN c_w - c_lw > 0 THEN
                 round(((c_w - c_lw) / CAST(c - c_l AS DOUBLE))
                       * log2(((c_w - c_lw) / CAST(c - c_l AS DOUBLE))
                              / ((c_lw / CAST(c_l AS DOUBLE)
                                  + (c_w - c_lw) / CAST(c - c_l AS DOUBLE)) / 2)),
                       10)
               ELSE 0 END AS DECIMAL(18,10)) AS q_term,
               CASE WHEN c_lw > 0 THEN 1 ELSE 0 END AS in_lang
        FROM cells
    )
    SELECT lang,
           CAST(SUM(in_lang) AS BIGINT) AS n_terms,
           round(0.5 * CAST(SUM(p_term) + SUM(q_term) AS DOUBLE), 6) AS jsd
    FROM contrib
    GROUP BY lang
    """,
    doc="Jensen-Shannon divergence (log2, in [0,1]) between each language's "
    "unigram distribution and the rest of the corpus.",
)
def js_divergence_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture drift metric: how far each language's word
    distribution sits from the rest of the corpus — the symmetric,
    always-finite alternative to KL for comparing source/language shards
    before reweighting a training mix.

    Scale shape: two word-grain aggregations (per-(lang,word), per-word),
    then a langs x vocab cell table built by crossing the 5-row language
    totals with the vocab — one shuffle joins the per-(lang,word) counts
    back.  Per-cell contributions are 10dp-quantized and decimal-summed,
    so the vocab-sized reduction is order-independent; only count ratios
    and log2 (both engine-deterministic to the quantization level) touch
    floating point.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select("lang", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    lw = (
        w.groupBy("lang", "word")
        .agg(F.count("*").alias("c_lw"))
        # (lang, word) rollup feeds wt/lt/tot AND the cells join — four
        # references, one materialization (at warehouse scale: persist)
        .localCheckpoint(eager=True)
    )
    wt = lw.groupBy("word").agg(F.sum("c_lw").alias("c_w"))
    lt = lw.groupBy("lang").agg(F.sum("c_lw").alias("c_l"))
    tot = wt.agg(F.sum("c_w").alias("c"))
    cells = (
        F.broadcast(lt)
        .crossJoin(wt)
        .crossJoin(F.broadcast(tot))
        .join(lw, ["lang", "word"], "left")
        # degenerate contract (see oracle): a language owning the WHOLE
        # corpus has no rest-of-corpus distribution (c - c_l = 0); the
        # filter precedes the q-ratio projection so ANSI never divides
        .filter(F.col("c_l") < F.col("c"))
        .select(
            "lang",
            "word",
            F.coalesce("c_lw", F.lit(0)).alias("c_lw"),
            "c_w",
            "c_l",
            "c",
        )
    )
    p = F.col("c_lw") / F.col("c_l").cast("double")
    q = (F.col("c_w") - F.col("c_lw")) / (F.col("c") - F.col("c_l")).cast("double")
    m = (p + q) / 2
    contrib = cells.select(
        "lang",
        F.when(F.col("c_lw") > 0, F.round(p * F.log2(p / m), 10))
        .otherwise(F.lit(0))
        .cast("decimal(18,10)")
        .alias("p_term"),
        F.when(F.col("c_w") - F.col("c_lw") > 0, F.round(q * F.log2(q / m), 10))
        .otherwise(F.lit(0))
        .cast("decimal(18,10)")
        .alias("q_term"),
        F.when(F.col("c_lw") > 0, 1).otherwise(0).alias("in_lang"),
    )
    return contrib.groupBy("lang").agg(
        F.sum("in_lang").alias("n_terms"),
        F.round(
            0.5 * (F.sum("p_term") + F.sum("q_term")).cast("double"), 6
        ).alias("jsd"),
    )


#: Coverage thresholds (percent of corpus tokens) for the vocab curve.
COVERAGE_PCTS = (50, 80, 90, 95, 99)


@register(
    "vocab_coverage_curve",
    oracle=rf"""
    WITH w AS (
        SELECT UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    freq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
    ranked AS (
        SELECT cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rnk,
               SUM(cnt) OVER (ORDER BY cnt DESC, word
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               SUM(cnt) OVER () AS total
        FROM freq
    ),
    t AS (SELECT UNNEST(ARRAY{list(COVERAGE_PCTS)}) AS pct)
    SELECT t.pct AS threshold_pct,
           CAST(MIN(r.rnk) AS BIGINT) AS n_terms,
           round(CAST(MIN_BY(r.cum, r.rnk) AS DOUBLE)
                 / CAST(MIN_BY(r.total, r.rnk) AS DOUBLE), 6) AS coverage
    FROM t JOIN ranked r ON r.cum * 100 >= t.pct * r.total
    GROUP BY t.pct
    """,
    doc=f"Vocabulary coverage curve: smallest top-N vocabulary covering "
    f"{COVERAGE_PCTS}% of corpus tokens (integer-exact threshold search).",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-truncation planning: how many distinct words a tokenizer
    needs to cover X% of the corpus.  The threshold test (cum*100 >=
    pct*total) is pure integer arithmetic, so the curve is exact in any
    engine; the one floating-point value (achieved coverage) is a ratio
    of the selected row's integers.

    Scale shape: one token explode + vocab agg, then a running sum over
    the RANKED VOCABULARY (vocab-grain, orders of magnitude smaller than
    the corpus; the same exact-tier sort inverted_index_postings uses),
    and a broadcast join against the 5 fixed thresholds.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("cnt"))
    order = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    ranked = freq.select(
        "cnt",
        F.row_number().over(order).alias("rnk"),
        F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    t = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in COVERAGE_PCTS])).alias("pct")
    )
    hit = F.broadcast(t).join(
        ranked, ranked["cum"] * 100 >= F.col("pct") * ranked["total"]
    )
    return hit.groupBy(F.col("pct").alias("threshold_pct")).agg(
        F.min("rnk").alias("n_terms"),
        F.round(
            F.min_by("cum", "rnk").cast("double")
            / F.min_by("total", "rnk").cast("double"),
            6,
        ).alias("coverage"),
    )


#: Burstiness: minimum corpus count for a term to be scored, and top-k.
BURSTY_MIN_COUNT = 50
BURSTY_TOP_K = 20


@register(
    "term_burstiness_vmr",
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    dw AS (SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM w GROUP BY 1, 2),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM w),
    stats AS (
        SELECT word,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q,
               n.n_docs
        FROM dw, nd n
        GROUP BY word, n.n_docs
        HAVING SUM(c) >= {BURSTY_MIN_COUNT}
    )
    SELECT word AS term, s AS total_cnt,
           round((CAST(q AS DOUBLE) / n_docs
                  - (CAST(s AS DOUBLE) / n_docs) * (CAST(s AS DOUBLE) / n_docs))
                 / (CAST(s AS DOUBLE) / n_docs), 6) AS vmr
    FROM stats
    ORDER BY vmr DESC, term
    LIMIT {BURSTY_TOP_K}
    """,
    doc=f"Top-{BURSTY_TOP_K} burstiest terms (variance-to-mean ratio of "
    "per-doc counts over ALL docs, zeros included) among terms with "
    f">= {BURSTY_MIN_COUNT} corpus occurrences.",
)
def term_burstiness_vmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness: content words clump (VMR >> 1), function
    words spread evenly (VMR ~ 1) — a cheap topicality signal and a
    boilerplate detector (templated terms show extreme VMR).

    Zeros cost nothing: VMR over ALL docs needs only Σc and Σc² of the
    docs that CONTAIN the term (zero rows add zero), so the sufficient
    statistics are integer sums over the (word, doc) table, and the
    final VMR is a deterministic double expression ordered with a term
    tie-break under TakeOrderedAndProject.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    dw = (
        w.groupBy("word", "doc_id")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # feeds both nd and stats
    )
    # every doc yields >= 1 token (split of "" is [""]), so distinct docs
    # in dw == distinct docs in the corpus — no second corpus scan
    nd = dw.agg(F.countDistinct("doc_id").alias("n_docs"))
    stats = (
        dw.groupBy("word")
        .agg(
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("q"),
        )
        .filter(F.col("s") >= BURSTY_MIN_COUNT)
        .crossJoin(F.broadcast(nd))
    )
    mean = F.col("s").cast("double") / F.col("n_docs")
    vmr = (F.col("q").cast("double") / F.col("n_docs") - mean * mean) / mean
    return (
        stats.select(
            F.col("word").alias("term"),
            F.col("s").alias("total_cnt"),
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.col("vmr").desc(), "term")
        .limit(BURSTY_TOP_K)
    )


#: Per-language vocabulary size compared in the overlap matrix.
VOCAB_OVERLAP_TOP_K = 500


@register(
    "vocab_overlap_langs",
    defer=True,
    oracle=rf"""
    WITH w AS (
        SELECT lang, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    lw AS (SELECT lang, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
    topv AS (
        SELECT lang, word FROM (
            SELECT lang, word,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY cnt DESC, word) AS rnk
            FROM lw
        ) WHERE rnk <= {VOCAB_OVERLAP_TOP_K}
    ),
    sizes AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM topv GROUP BY 1),
    inter AS (
        SELECT a.lang AS lang_a, b.lang AS lang_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM topv a JOIN topv b ON b.word = a.word AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT i.lang_a, i.lang_b, i.n_common,
           sa.n + sb.n - i.n_common AS n_union,
           round(i.n_common / CAST(sa.n + sb.n - i.n_common AS DOUBLE), 6)
               AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.lang = i.lang_a
    JOIN sizes sb ON sb.lang = i.lang_b
    """,
    doc=f"Pairwise Jaccard overlap of the top-{VOCAB_OVERLAP_TOP_K} "
    "vocabularies of each language pair.",
)
def vocab_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sharing diagnostic: languages with high top-K vocabulary
    overlap can share a subword budget; near-zero overlap argues for a
    bigger multilingual vocab.  Top-K selection is deterministic (count
    desc, word) and the overlap join runs on langs x K rows — bounded
    regardless of corpus size.  One token explode + one (lang, word) agg
    touch the corpus.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select("lang", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    lw = w.groupBy("lang", "word").agg(F.count("*").alias("cnt"))
    topv = (
        lw.select(
            "lang",
            "word",
            F.row_number()
            .over(Window.partitionBy("lang").orderBy(F.desc("cnt"), "word"))
            .alias("rnk"),
        )
        .filter(F.col("rnk") <= VOCAB_OVERLAP_TOP_K)
        .select("lang", "word")
        .localCheckpoint(eager=True)  # reused: sizes + both join sides
    )
    sizes = topv.groupBy("lang").agg(F.count("*").alias("n"))
    a = topv.select(F.col("lang").alias("lang_a"), "word")
    b = topv.select(F.col("lang").alias("lang_b"), "word")
    inter = (
        a.join(b, "word")
        .filter(F.col("lang_a") < F.col("lang_b"))
        .groupBy("lang_a", "lang_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("lang").alias("lang_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("lang").alias("lang_b"), F.col("n").alias("n_b"))
    j = inter.join(F.broadcast(sa), "lang_a").join(F.broadcast(sb), "lang_b")
    union_n = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return j.select(
        "lang_a",
        "lang_b",
        "n_common",
        union_n.alias("n_union"),
        F.round(F.col("n_common") / union_n.cast("double"), 6).alias("jaccard"),
    )


@register(
    "yule_k_lexical_richness",
    defer=True,
    oracle=rf"""
    WITH w AS (
        SELECT UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    freq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS m FROM w GROUP BY 1),
    fof AS (
        -- frequency of frequencies: V_m words occur exactly m times
        SELECT m, CAST(COUNT(*) AS BIGINT) AS v_m FROM freq GROUP BY 1
    ),
    s AS (
        SELECT CAST(SUM(m * v_m) AS BIGINT) AS n,
               CAST(SUM(m * m * v_m) AS BIGINT) AS s2,
               CAST(SUM(v_m) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN m = 1 THEN v_m ELSE 0 END) AS BIGINT)
                   AS hapax
        FROM fof
    )
    SELECT n AS n_tokens, vocab AS n_types, hapax AS n_hapax,
           round(hapax / CAST(vocab AS DOUBLE), 6) AS hapax_ratio,
           round(10000.0 * (s2 - n) / (CAST(n AS DOUBLE) * n), 6) AS yule_k
    FROM s
    """,
    doc="Yule's K lexical-richness characteristic (10^4 * (S2 - N) / N^2 "
    "over the frequency-of-frequencies table) plus the hapax-legomenon "
    "ratio.",
)
def yule_k_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-independent vocabulary-richness constant (unlike raw
    type-token ratio, K barely moves with corpus size) — repetitive or
    templated text drives K up sharply, natural prose sits in the
    100-200 range.  Everything reduces to the frequency-of-frequencies
    table: two integer aggregations after the token explode, then one
    closed-form expression — no floats until the final division.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("m"))
    fof = freq.groupBy("m").agg(F.count("*").alias("v_m"))
    s = fof.agg(
        F.sum(F.col("m") * F.col("v_m")).alias("n"),
        F.sum(F.col("m") * F.col("m") * F.col("v_m")).alias("s2"),
        F.sum("v_m").alias("vocab"),
        F.sum(F.when(F.col("m") == 1, F.col("v_m")).otherwise(0)).alias("hapax"),
    )
    n = F.col("n")
    return s.select(
        n.alias("n_tokens"),
        F.col("vocab").alias("n_types"),
        F.col("hapax").alias("n_hapax"),
        F.round(F.col("hapax") / F.col("vocab").cast("double"), 6).alias(
            "hapax_ratio"
        ),
        F.round(10000.0 * (F.col("s2") - n) / (n.cast("double") * n), 6).alias(
            "yule_k"
        ),
    )


#: TTR profile: doc-length buckets (tokens, powers of 2).
TTR_BUCKET_LOG2 = 1


@register(
    "type_token_ratio_profile",
    defer=True,
    oracle=rf"""
    WITH w AS (
        SELECT doc_id, UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    d AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(COUNT(DISTINCT word) AS BIGINT) AS n_typ
        FROM w GROUP BY 1
    )
    SELECT CAST(floor(log2(n_tok)) AS BIGINT) AS len_bucket_log2,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(round(n_typ / CAST(n_tok AS DOUBLE), 6)
                                AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_ttr
    FROM d GROUP BY 1
    """,
    doc="Type-token ratio by doc-length bucket (log2 token-count "
    "buckets): the length-stratified vocabulary-diversity profile.",
)
def type_token_ratio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTR is length-dependent by construction (longer docs repeat more),
    so comparing raw ratios across docs is meaningless — the profile
    strata TTR by log2 length bucket, making templated docs stand out
    WITHIN their length class.  One explode + one per-doc (count,
    distinct) aggregation; per-doc ratios are 6dp-quantized before the
    per-bucket decimal mean.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id", F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word")
    )
    d = w.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"), F.countDistinct("word").alias("n_typ")
    )
    ttr6 = F.round(F.col("n_typ") / F.col("n_tok").cast("double"), 6).cast(
        "decimal(18,6)"
    )
    return d.groupBy(
        F.floor(F.log2("n_tok")).cast("long").alias("len_bucket_log2")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.sum(ttr6).cast("double") / F.count("*"), 6).alias("avg_ttr"),
    )


#: Good-Turing tail thresholds: mass of words seen at most r times.
GT_TAIL_RS = (1, 2, 5, 10)


@register(
    "good_turing_tail_mass",
    defer=True,
    oracle=rf"""
    WITH w AS (
        SELECT UNNEST({SQL_SPLIT_FOLDED}) AS word
        FROM documents
    ),
    freq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS m FROM w GROUP BY 1),
    fof AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS v_m FROM freq GROUP BY 1),
    tot AS (SELECT CAST(SUM(m * v_m) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN m = 1 THEN v_m ELSE 0 END) AS BIGINT)
                       AS n1
            FROM fof),
    rs AS (SELECT UNNEST(ARRAY{list(GT_TAIL_RS)}) AS r)
    SELECT rs.r AS max_count,
           CAST(SUM(CASE WHEN f.m <= rs.r THEN f.v_m ELSE 0 END) AS BIGINT)
               AS n_types,
           CAST(SUM(CASE WHEN f.m <= rs.r THEN f.m * f.v_m ELSE 0 END)
                AS BIGINT) AS n_tokens,
           round(CAST(SUM(CASE WHEN f.m <= rs.r THEN f.m * f.v_m ELSE 0 END)
                      AS BIGINT) / CAST(MAX(t.n) AS DOUBLE), 6) AS tail_mass,
           round(CAST(MAX(t.n1) AS DOUBLE) / MAX(t.n), 6) AS gt_unseen_mass
    FROM rs, fof f, tot t
    GROUP BY rs.r
    """,
    doc=f"Rare-word tail mass at count thresholds {GT_TAIL_RS} plus the "
    "Good-Turing unseen-mass estimate (hapax count / tokens).",
)
def good_turing_tail_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus rides on rare words — the quantity that
    decides vocabulary truncation pain (vocab_coverage_curve asks it
    head-first; this asks it tail-first) and whose r=0 extrapolation is
    Good-Turing's unseen-probability estimate N1/N.  Pure integer
    arithmetic over the frequency-of-frequencies table crossed with the
    4-row threshold spine; one token explode touches the corpus.
    """
    docs = table(spark, sf_dir, "documents")
    w = docs.select(F.explode(F.split(ascii_fold("text"), WS_RE)).alias("word"))
    freq = w.groupBy("word").agg(F.count("*").alias("m"))
    fof = freq.groupBy("m").agg(F.count("*").alias("v_m")).localCheckpoint(
        eager=True
    )  # crossed with the threshold spine AND reduced for totals
    tot = fof.agg(
        F.sum(F.col("m") * F.col("v_m")).alias("n"),
        F.sum(F.when(F.col("m") == 1, F.col("v_m")).otherwise(0)).alias("n1"),
    )
    rs = spark.range(1).select(
        F.explode(F.array(*[F.lit(r) for r in GT_TAIL_RS])).alias("r")
    )
    j = F.broadcast(rs).join(fof, F.lit(True)).crossJoin(F.broadcast(tot))
    in_tail = F.col("m") <= F.col("r")
    return j.groupBy(F.col("r").alias("max_count")).agg(
        F.sum(F.when(in_tail, F.col("v_m")).otherwise(0)).alias("n_types"),
        F.sum(F.when(in_tail, F.col("m") * F.col("v_m")).otherwise(0)).alias(
            "n_tokens"
        ),
        F.round(
            F.sum(F.when(in_tail, F.col("m") * F.col("v_m")).otherwise(0))
            / F.max("n").cast("double"),
            6,
        ).alias("tail_mass"),
        F.round(F.max("n1").cast("double") / F.max("n"), 6).alias("gt_unseen_mass"),
    )


# ---------------------------------------------------------------------------
# Feature-hashing collision profile (round 8)

FEATHASH_BUCKETS = 4096
FEATHASH_NGRAM = 3


def _feature_hashing_oracle() -> str:
    """DuckDB replay of the hashing trick: bucket = pmod(xxhash64(
    shingle), 4096) via the bit-exact HUGEINT string-hash replay, then
    the occupancy histogram.  pmod runs on the SIGNED hash (u64 % m and
    signed pmod differ)."""
    from azure_func_forem_data_etl_spark.functions import xxh64_sql as X
    from azure_func_forem_data_etl_spark.operators.dedup import _sql_shingles

    hash_ctes = X.xxh64_str_ctes(
        "fh", "vocab", ["sid"], "s_txt", [(0, X.SPARK_HASH_SEED)]
    )
    signed = X.signed64("h")
    return f"""
    WITH RECURSIVE sh AS ({_sql_shingles(FEATHASH_NGRAM)}),
    vocab AS (
        SELECT shingle AS s_txt, row_number() OVER (ORDER BY shingle) AS sid
        FROM (SELECT DISTINCT shingle FROM sh)
    ),
    {hash_ctes},
    load AS (
        SELECT (({signed} % {FEATHASH_BUCKETS}) + {FEATHASH_BUCKETS})
                   % {FEATHASH_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS occupancy
        FROM fh_hash GROUP BY 1
    )
    SELECT occupancy, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(occupancy) AS BIGINT) AS n_features
    FROM load GROUP BY occupancy
    """


@register(
    "feature_hashing_collisions",
    defer=2,
    oracle=_feature_hashing_oracle(),
    doc=f"Hashing-trick collision profile: distinct {FEATHASH_NGRAM}-gram "
    f"shingles bucketed by pmod(xxhash64, {FEATHASH_BUCKETS}); occupancy "
    "histogram (how many buckets hold k features).",
)
def feature_hashing_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capacity-planning view for hashed feature spaces (HashingTF,
    embedding-table bucketing): with |vocab| features in m buckets, how
    heavy are the collisions that silently merge features?  Distinct
    shingles -> one JVM hash + modulus -> two keyed aggs; output bounded
    by the max bucket load.
    """
    from azure_func_forem_data_etl_spark.operators.dedup import word_shingles
    from azure_func_forem_data_etl_spark.sources.tables import scale_out

    docs = table(spark, sf_dir, "documents")
    vocab = (
        word_shingles(scale_out(docs, "doc_id"), FEATHASH_NGRAM)
        .select("shingle")
        .distinct()
    )
    load = vocab.groupBy(
        F.pmod(F.xxhash64("shingle"), F.lit(FEATHASH_BUCKETS)).alias("bucket")
    ).agg(F.count("*").alias("occupancy"))
    return load.groupBy("occupancy").agg(
        F.count("*").alias("n_buckets"),
        F.sum("occupancy").alias("n_features"),
    )

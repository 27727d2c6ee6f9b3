"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas`` (north-star LLM pipeline).

Two REAL decode paths run in-line (operators/codecs.py, dependency-free):
PNG (chunk walk, IHDR dims, IDAT inflate + filter inversion) and WAV
(stdlib ``wave`` header parse, 8/16/24/32-bit PCM).  Both mappers sniff
magic bytes and dispatch; payloads in neither format fall back to the
clearly-marked deterministic stubs (`_fake_decode_image`, PCM16
reinterpretation) standing in for PIL/ffmpeg, which the container lacks.
``with_media_column`` synthesizes real PNG/WAV payloads deterministically
from doc_id so the real decoders execute inside registered,
oracle-checked queries (`multimodal_png_decode`,
`multimodal_audio_stats`).

At 100 TB: binary payloads never pass through Python row-at-a-time —
Arrow moves whole columns; per-batch numpy does the byte crunching;
nothing shuffles except the (small) extracted features.
"""

from __future__ import annotations

import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from azure_func_forem_data_etl_spark.operators.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    is_png,
    is_wav,
)
from azure_func_forem_data_etl_spark.plans.registry import register
from azure_func_forem_data_etl_spark.sources.tables import (
    SQL_DOCS_CANON,
    entity_table,
    table,
)

FRAME_BYTES = 64  # "video" frame-sampling stride for the stub decoder


def with_binary_column(docs: DataFrame) -> DataFrame:
    """Model a multimodal lake row: opaque bytes + typed metadata struct.

    (Real pipelines read the bytes from object storage; here the
    documents' UTF-8 text stands in as the payload.)
    """
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("image/x-fake").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.lit("stub://decoder").alias("source_uri"),
    )
    # media domain: docs WITH text (r12 NULL-heavy sweep) — a NULL text
    # has no bytes to stand in as a payload; every multimodal oracle
    # carries the same WHERE text IS NOT NULL
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", payload.alias("payload"), meta.alias("media_meta")
    )


# ---------------------------------------------------------------------------
# Mixed-media column: REAL PNG / WAV payloads, deterministically synthesized
# per doc_id so the real decoders (operators/codecs.py) execute inside
# registered queries AND remain DuckDB-oracle-checkable — the content
# functions below are plain integer arithmetic a SQL oracle can replay
# (r4 VERDICT ask #2b).

#: media tier assignment: media_base % 7 == 0 -> PNG; elif % 11 == 0 -> WAV
PNG_DOC_MOD = 7
WAV_DOC_MOD = 11

#: WAV tier parameter tables (indexed by media_base arithmetic)
WAV_RATES = (8000, 16000, 44100)
WAV_WIDTHS = (1, 2, 3, 4)  # sample bytes: 8/16/24/32-bit

#: Every media derivation runs on ``media_base(doc_id) = doc_id mod 2^31``
#: (floored, always non-negative), NOT the raw id: ids are opaque int64s
#: (r11 id-domain sweep), and the raw-id arithmetic breaks twice at the
#: extremes — Python/numpy floored ``%`` disagrees with SQL's truncated
#: ``%`` on NEGATIVE ids, and ``doc_id * 31`` wraps numpy int64 (while
#: DuckDB promotes or throws) near 2^62.  The 2^31 reduction is the
#: identity on every realistic id, and the oracle replays it as
#: ``((doc_id % 2147483648) + 2147483648) % 2147483648`` (SQL_MEDIA_BASE).
_MEDIA_BASE_MOD = 1 << 31
SQL_MEDIA_BASE = (
    f"(((doc_id % {_MEDIA_BASE_MOD}) + {_MEDIA_BASE_MOD}) % {_MEDIA_BASE_MOD})"
)


def media_base(doc_id: int) -> int:
    """doc_id mod 2^31 (floored, non-negative) — see SQL_MEDIA_BASE."""
    return doc_id % _MEDIA_BASE_MOD


def png_dims(doc_id: int) -> tuple[int, int, int]:
    """(width, height, channels) of the synthetic PNG for ``doc_id`` —
    exercises every color type (gray / gray+alpha / RGB / RGBA)."""
    b = media_base(doc_id)
    return 4 + b % 13, 3 + b % 5, 1 + b % 4


def media_payload(doc_id: int, text: str) -> tuple[bytes, str]:
    """Deterministic (payload, mime) for one document row.

    PNG pixels: ``(base*31 + y*17 + x*7 + c*3) % 256`` — covers all four
    8-bit color types across doc_ids.  WAV samples:
    ``((base*7 + frame*13 + chan*5) % 201) - 100`` — small signed
    amplitude valid at every sample width (8/16/24/32-bit), mono and
    stereo, three sample rates.  Everything else ships the UTF-8 text as
    an opaque raw payload (the stub tier).  ``base = media_base(doc_id)``
    throughout (id-domain contract, see SQL_MEDIA_BASE).
    """
    b = media_base(doc_id)
    if b % PNG_DOC_MOD == 0:
        w, h, ch = png_dims(doc_id)
        y, x, c = np.indices((h, w, ch))
        px = ((b * 31 + y * 17 + x * 7 + c * 3) % 256).astype(np.uint8)
        return encode_png(px), "image/png"
    if b % WAV_DOC_MOD == 0:
        rate = WAV_RATES[b % 3]
        sampwidth = WAV_WIDTHS[b % 4]
        n_ch = 1 + b % 2
        n_frames = 20 + b % 50
        i, c = np.indices((n_frames, n_ch))
        v = (b * 7 + i * 13 + c * 5) % 201 - 100
        return encode_wav(v, rate, sampwidth), "audio/wav"
    return text.encode("utf-8"), "text/plain"


def with_media_column(docs: DataFrame) -> DataFrame:
    """Mixed-media lake rows: real PNG / real WAV / raw-text payloads with
    a typed metadata struct, built Arrow-batch-at-a-time (payload bytes
    are born in the scan partition and never shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            made = [
                media_payload(int(d), t)
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "payload": [p for p, _ in made],
                    "mime": [m for _, m in made],
                }
            )

    # media domain: docs WITH text (r12 NULL-heavy sweep) — see
    # with_binary_column
    flat = (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", "text")
        .mapInPandas(gen, schema="doc_id long, payload binary, mime string")
    )
    meta = F.struct(
        F.col("mime").alias("mime"),
        F.length("payload").alias("n_bytes"),
        F.lit("synthetic://media").alias("source_uri"),
    )
    return flat.select("doc_id", "payload", meta.alias("media_meta"))


def _fake_decode_image(buf: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fallback for payloads that are not a
    supported real format (see ``_decode_image``)."""
    width = 1 + len(buf) % 512
    height = 1 + (buf[0] if buf else 0) * 2
    checksum = zlib.crc32(buf) & 0xFFFFFFFF
    return width, height, checksum


def _decode_image(buf: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, crc32, decoded_bytes): REAL pure-Python PNG decode
    (operators/codecs.py) when the payload is a PNG — true dimensions from
    IHDR, pixels via IDAT inflate + filter inversion, checksum over the
    decoded pixel buffer; deterministic stub otherwise (the payload bytes
    themselves stand in for pixels)."""
    if is_png(buf):
        try:
            px = decode_png(buf)
            decoded = px.tobytes()
            return px.shape[1], px.shape[0], zlib.crc32(decoded) & 0xFFFFFFFF, decoded
        except (ValueError, zlib.error, struct.error):
            # unsupported subtype OR corrupt body: decode_png raises
            # zlib.error on a bad IDAT stream and struct.error on a
            # truncated IHDR, not just ValueError — all three must fall
            # back or a malformed payload kills the whole mapInPandas
            # task (ADVICE r4, "keeps every query total" contract).
            pass
    width, height, checksum = _fake_decode_image(buf)
    return width, height, checksum, buf


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("n_bytes_decoded", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("crc32", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_crcs", T.ArrayType(T.LongType())),
        T.StructField("byte_embedding", T.ArrayType(T.FloatType())),
    ]
)


def _feature_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode + feature-extract one Arrow batch at a time."""
    for pdf in batches:
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(buf)
            width, height, checksum, decoded = _decode_image(buf)
            # "frame sampling": one CRC per FRAME_BYTES block of decoded data
            frames = [
                zlib.crc32(decoded[i : i + FRAME_BYTES]) & 0xFFFFFFFF
                for i in range(0, len(decoded), FRAME_BYTES)
            ]
            # "embedding": first 16 decoded bytes, zero-padded, L2-normalized
            raw = np.frombuffer(
                decoded[:16].ljust(16, b"\0"), dtype=np.uint8
            ).astype(np.float32)
            norm = float(np.linalg.norm(raw)) or 1.0
            rows.append(
                (
                    doc_id,
                    len(buf),
                    len(decoded),
                    width,
                    height,
                    checksum,
                    len(frames),
                    frames,
                    (raw / norm).tolist(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in _FEATURE_SCHEMA.fields],
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    return media.select("doc_id", "payload").mapInPandas(
        _feature_mapper, schema=_FEATURE_SCHEMA
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           1 + octet_length(encode(text)) % 512 AS width,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) AS n_frames
    -- media domain: docs WITH text (r12 NULL-heavy sweep)
    FROM documents WHERE text IS NOT NULL
    """,
    doc="Multimodal plumbing: binary payload + metadata -> mapInPandas decode (stub) -> features.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-derived columns (n_bytes/width/n_frames) are oracle-checked;
    CRC/embedding columns exist only Spark-side so are excluded here and
    covered by unit tests instead."""
    docs = table(spark, sf_dir, "documents")
    media = with_binary_column(docs)
    feats = extract_media_features(media)
    return feats.select("doc_id", "n_bytes", "width", "n_frames")


# --- DECODED-byte replay for the mixed-media column (r6 promotion) -------
#
# Every byte ``_decode_image`` produces is a pure function of doc_id/text:
# PNG-tier pixels are the synthesis arithmetic (same replay as
# multimodal_png_decode), non-PNG tiers decode to the PAYLOAD itself —
# the 44-byte canonical RIFF/WAVE header + little-endian PCM for the WAV
# tier (every field derives from doc_id) and the UTF-8 text for the raw
# tier (true bytes via hex(encode(text)) nibble pairs — byte-exact on
# any text, r10).  (i, b) is the 0-based decoded byte stream per doc.

#: signed WAV sample value at data-byte j (sample s = j // sw, byte-in-
#: sample k = j % sw; frame = s // nch, channel = s % nch)
_WAV_V = (
    "((w.base*7 + ((t.j // w.sw) // w.nch)*13"
    " + ((t.j // w.sw) % w.nch)*5) % 201) - 100"
)

_MEDIA_DECODED_BYTES_SQL = f"""
    tier AS (
      -- every derivation runs on base = doc_id mod 2^31 (id-domain
      -- contract, see SQL_MEDIA_BASE: floored and overflow-free on
      -- negative / near-2^62 ids where raw-id % and * diverge or wrap)
      SELECT doc_id, {SQL_MEDIA_BASE} AS base, text,
        CASE WHEN {SQL_MEDIA_BASE} % {PNG_DOC_MOD} = 0 THEN 'png'
             WHEN {SQL_MEDIA_BASE} % {WAV_DOC_MOD} = 0 THEN 'wav'
             ELSE 'raw' END AS tier
      -- media domain: docs WITH text (r12 NULL-heavy sweep)
      FROM documents_canon WHERE text IS NOT NULL
    ),
    png AS (SELECT doc_id, base, 4 + base % 13 AS w, 3 + base % 5 AS h,
                   1 + base % 4 AS ch FROM tier WHERE tier = 'png'),
    wavp AS (SELECT *, nf * nch * sw AS ds FROM (
        SELECT doc_id, base,
               [8000, 16000, 44100][CAST(base % 3 AS INT) + 1] AS rate,
               [1, 2, 3, 4][CAST(base % 4 AS INT) + 1] AS sw,
               1 + base % 2 AS nch,
               20 + base % 50 AS nf
        FROM tier WHERE tier = 'wav')),
    png_bytes AS (
      SELECT p.doc_id, t.j AS i,
             (p.base*31 + (t.j // (p.w*p.ch))*17
              + ((t.j % (p.w*p.ch)) // p.ch)*7 + (t.j % p.ch)*3) % 256 AS b
      FROM png p, UNNEST(range(0, CAST(p.w AS BIGINT)*p.h*p.ch)) t(j)
    ),
    wav_header AS (
      -- the stdlib wave module's canonical 44-byte PCM header,
      -- little-endian field by field
      SELECT w.doc_id, t.j AS i,
        CASE
          WHEN t.j = 0 THEN 82 WHEN t.j = 1 THEN 73
          WHEN t.j = 2 THEN 70 WHEN t.j = 3 THEN 70           -- 'RIFF'
          WHEN t.j BETWEEN 4 AND 7
               THEN ((36 + w.ds) >> CAST(8*(t.j - 4) AS INT)) & 255
          WHEN t.j = 8 THEN 87 WHEN t.j = 9 THEN 65
          WHEN t.j = 10 THEN 86 WHEN t.j = 11 THEN 69         -- 'WAVE'
          WHEN t.j = 12 THEN 102 WHEN t.j = 13 THEN 109
          WHEN t.j = 14 THEN 116 WHEN t.j = 15 THEN 32        -- 'fmt '
          WHEN t.j BETWEEN 16 AND 19
               THEN (16 >> CAST(8*(t.j - 16) AS INT)) & 255   -- fmt size
          WHEN t.j BETWEEN 20 AND 21
               THEN (1 >> CAST(8*(t.j - 20) AS INT)) & 255    -- PCM
          WHEN t.j BETWEEN 22 AND 23
               THEN (w.nch >> CAST(8*(t.j - 22) AS INT)) & 255
          WHEN t.j BETWEEN 24 AND 27
               THEN (w.rate >> CAST(8*(t.j - 24) AS INT)) & 255
          WHEN t.j BETWEEN 28 AND 31
               THEN ((w.rate*w.nch*w.sw) >> CAST(8*(t.j - 28) AS INT)) & 255
          WHEN t.j BETWEEN 32 AND 33
               THEN ((w.nch*w.sw) >> CAST(8*(t.j - 32) AS INT)) & 255
          WHEN t.j BETWEEN 34 AND 35
               THEN ((w.sw*8) >> CAST(8*(t.j - 34) AS INT)) & 255
          WHEN t.j = 36 THEN 100 WHEN t.j = 37 THEN 97
          WHEN t.j = 38 THEN 116 WHEN t.j = 39 THEN 97        -- 'data'
          ELSE (w.ds >> CAST(8*(t.j - 40) AS INT)) & 255
        END AS b
      FROM wavp w, UNNEST(range(0, 44)) t(j)
    ),
    wav_data AS (
      -- 8-bit stores unsigned (v+128); wider widths little-endian two's
      -- complement at the sample width
      SELECT w.doc_id, 44 + t.j AS i,
        CASE WHEN w.sw = 1
             THEN {_WAV_V} + 128
             ELSE ((CASE WHEN {_WAV_V} < 0
                         THEN {_WAV_V} + (CAST(1 AS BIGINT) << CAST(8*w.sw AS INT))
                         ELSE {_WAV_V} END)
                   >> CAST(8*(t.j % w.sw) AS INT)) & 255
        END AS b
      FROM wavp w, UNNEST(range(0, w.ds)) t(j)
    ),
    raw_hex AS (
      -- r10: true UTF-8 BYTES via hex(encode(text)), not
      -- ascii(substring(text, ...)) which is per-CHARACTER and only
      -- equals the byte on ASCII corpora (multibyte sweep finding)
      SELECT doc_id, lower(hex(encode(text))) AS hx
      FROM tier WHERE tier = 'raw'
    ),
    raw_bytes AS (
      SELECT doc_id, t.i,
             (strpos('0123456789abcdef',
                     substring(hx, CAST(2 * t.i + 1 AS INT), 1)) - 1) * 16
             + (strpos('0123456789abcdef',
                       substring(hx, CAST(2 * t.i + 2 AS INT), 1)) - 1) AS b
      FROM raw_hex, UNNEST(range(0, length(hx) // 2)) t(i)
    ),
    all_bytes AS (
      SELECT * FROM png_bytes UNION ALL
      SELECT * FROM wav_header UNION ALL
      SELECT * FROM wav_data UNION ALL
      SELECT * FROM raw_bytes
    )
"""


def _crc_table_expr() -> str:
    """The CRC-32 (IEEE 802.3, poly 0xEDB88320 reflected) table entry for
    ``r.n``: eight unrolled steps of c -> (c>>1) XOR (poly if c&1)."""
    expr = "CAST(r.n AS BIGINT)"
    for _ in range(8):
        expr = (
            f"(CASE WHEN ({expr}) & 1 = 1"
            f" THEN xor(({expr}) >> 1, 3988292384)"
            f" ELSE ({expr}) >> 1 END)"
        )
    return expr


@register(
    "multimodal_full_features",
    # Promoted rows-only -> oracle in r6: the one blocker was CRC32
    # (DuckDB 1.0 ships no crc32/zlib function), and CRC32 is just an
    # 8-step-unrolled 256-entry table (built by _crc_table_expr from the
    # reflected polynomial) plus a per-byte left fold — a list_reduce
    # over each stream's ordered decoded bytes, which
    # _MEDIA_DECODED_BYTES_SQL regenerates for all three tiers.  Streams:
    # sid -1 = the whole decoded buffer (payload crc32), sid k>=0 = its
    # k-th FRAME_BYTES block (frame_crcs).  The byte-embedding scalars
    # replay too: the 16-byte head's float32 L2 norm is exact (integer
    # squares < 2^24 keep float32 sums exact; sqrt correctly rounded) and
    # the per-element division + double fold mirror numpy/Spark op for op.
    # The projection's n_bytes became n_bytes_decoded (decoder OUTPUT
    # size): the encoded-PNG payload length is zlib-output-dependent, the
    # one number a relational replay cannot produce.
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    {_MEDIA_DECODED_BYTES_SQL},
    streams AS (
      SELECT doc_id, CAST(-1 AS BIGINT) AS sid, i AS pos, b FROM all_bytes
      UNION ALL
      SELECT doc_id, i // {FRAME_BYTES} AS sid, i % {FRAME_BYTES} AS pos, b
      FROM all_bytes
    ),
    crctab AS (SELECT r.n, {{CRCTAB}} AS t FROM range(0, 256) r(n)),
    crctab_arr AS (SELECT list(t ORDER BY n) AS tab FROM crctab),
    crc_final AS (
      SELECT doc_id, sid,
             xor(list_reduce(
                   list_prepend(CAST(4294967295 AS BIGINT),
                                list(b ORDER BY pos)),
                   (acc, x) -> xor(acc >> 8,
                                   tab[CAST(xor(acc, x) & 255 AS INT) + 1])),
                 4294967295) AS crc
      FROM streams, crctab_arr
      GROUP BY doc_id, sid, tab
    ),
    crc_agg AS (
      SELECT doc_id,
             MAX(CASE WHEN sid = -1 THEN crc END) AS crc32,
             CAST(COUNT(CASE WHEN sid >= 0 THEN 1 END) AS INT) AS n_frames,
             MAX(CASE WHEN sid = 0 THEN crc END) AS frame_crc_first,
             CAST(SUM(CASE WHEN sid >= 0 THEN crc ELSE 0 END) AS BIGINT)
                 AS frame_crc_sum
      FROM crc_final GROUP BY doc_id
    ),
    nbytes AS (
      SELECT t.doc_id, CAST(COUNT(ab.b) AS INT) AS n_dec
      FROM tier t LEFT JOIN all_bytes ab ON ab.doc_id = t.doc_id
      GROUP BY t.doc_id
    ),
    head AS (
      SELECT t.doc_id, g.k, COALESCE(ab.b, 0) AS b
      FROM tier t
      CROSS JOIN UNNEST(range(0, 16)) g(k)
      LEFT JOIN all_bytes ab ON ab.doc_id = t.doc_id AND ab.i = g.k
    ),
    emb AS (
      SELECT doc_id,
             CASE WHEN SUM(b*b) = 0 THEN CAST(1.0 AS REAL)
                  ELSE CAST(sqrt(CAST(SUM(b*b) AS DOUBLE)) AS REAL)
             END AS nrm,
             list(CAST(b AS REAL) ORDER BY k) AS hb
      FROM head GROUP BY doc_id
    ),
    embv AS (
      SELECT doc_id, list_transform(hb, x -> CAST(x / nrm AS REAL)) AS v
      FROM emb
    ),
    dims AS (
      SELECT t.doc_id,
             CASE t.tier WHEN 'png' THEN CAST(4 + t.base % 13 AS INT)
                         WHEN 'wav' THEN CAST(1 + (44 + w.ds) % 512 AS INT)
                         ELSE CAST(1 + octet_length(encode(t.text)) % 512
                                   AS INT)
             END AS width,
             CASE t.tier WHEN 'png' THEN CAST(3 + t.base % 5 AS INT)
                         WHEN 'wav' THEN CAST(165 AS INT)  -- 1 + 2*ord('R')
                         -- first UTF-8 BYTE via hex (the stub reads
                         -- buf[0]); ascii(substring) is the code point,
                         -- wrong on multibyte leads (r10 sweep)
                         ELSE CAST(1 + 2 * CASE
                                WHEN octet_length(encode(t.text)) = 0 THEN 0
                                ELSE (strpos('0123456789abcdef',
                                        substring(lower(hex(encode(t.text))), 1, 1)) - 1) * 16
                                     + (strpos('0123456789abcdef',
                                        substring(lower(hex(encode(t.text))), 2, 1)) - 1)
                                END AS INT)
             END AS height
      FROM tier t LEFT JOIN wavp w ON w.doc_id = t.doc_id
    )
    SELECT d.doc_id,
           nb.n_dec AS n_bytes_decoded,
           d.width, d.height,
           COALESCE(c.crc32, 0) AS crc32,
           COALESCE(c.n_frames, 0) AS n_frames,
           c.frame_crc_first,
           COALESCE(c.frame_crc_sum, 0) AS frame_crc_sum,
           CAST(16 AS INT) AS emb_dim,
           round(CAST(e.v[1] AS DOUBLE), 6) AS emb_x0,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list_transform(e.v, x -> CAST(x AS DOUBLE))),
                 (a, x) -> a + x), 6) AS emb_sum
    FROM dims d
    JOIN nbytes nb ON nb.doc_id = d.doc_id
    LEFT JOIN crc_agg c ON c.doc_id = d.doc_id
    JOIN embv e ON e.doc_id = d.doc_id
    """.replace("{CRCTAB}", _crc_table_expr()),
    doc="Full multimodal feature set over the MIXED-media column (real "
    "PNG decode for image-tier docs, stub elsewhere) incl. frame CRCs "
    "and byte embedding, hash-matched against a DuckDB byte replay with "
    "an in-SQL CRC-32.",
)
def multimodal_full_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array columns (frame_crcs, byte_embedding) are projected to scalar
    surrogates for the registry-facing result — the driver's canonicalizer
    hashes values and cannot sort lists.  The full-array variant stays
    available via ``extract_media_features`` (unit-tested in
    tests/test_llm_ops.py).  Runs on ``with_media_column``, so image-tier
    docs flow through the REAL PNG decoder (width/height from actual IHDR,
    CRCs over actual unfiltered pixels) and the rest through the stub."""
    docs = entity_table(spark, sf_dir, "documents")
    feats = extract_media_features(with_media_column(docs))
    return feats.select(
        "doc_id",
        "n_bytes_decoded",
        "width",
        "height",
        "crc32",
        "n_frames",
        # when-guarded: an empty decoded payload has NO frames, and ANSI
        # element_at throws on index 1 of an empty array (r10 null-shape
        # sweep); the oracle's LEFT JOIN yields NULL there
        F.when(
            F.size("frame_crcs") > 0, F.element_at("frame_crcs", 1)
        ).alias("frame_crc_first"),
        F.expr("aggregate(frame_crcs, 0L, (a, x) -> a + x)").alias("frame_crc_sum"),
        F.size("byte_embedding").alias("emb_dim"),
        F.round(F.element_at("byte_embedding", 1).cast("double"), 6).alias("emb_x0"),
        F.round(
            F.expr(
                "aggregate(byte_embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"
            ),
            6,
        ).alias("emb_sum"),
    )


_PNG_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, pixel_sum long"
)


@register(
    "multimodal_png_decode",
    # The synthetic pixel function is plain integer arithmetic, so DuckDB
    # can regenerate every pixel with unnest(range) and sum them — while
    # the Spark side reads them back out of the ACTUAL encoded PNG via the
    # chunk-walk/inflate/unfilter decoder.  A hash match proves the real
    # decode end-to-end (dims from IHDR, pixels from IDAT).
    oracle=f"""
    WITH img AS (
      -- base = doc_id mod 2^31: the id-domain contract (SQL_MEDIA_BASE)
      SELECT doc_id, {SQL_MEDIA_BASE} AS base,
             CAST(4 + {SQL_MEDIA_BASE} % 13 AS INT) AS width,
             CAST(3 + {SQL_MEDIA_BASE} % 5 AS INT) AS height,
             CAST(1 + {SQL_MEDIA_BASE} % 4 AS INT) AS n_channels
      -- media domain: docs WITH text (r12 NULL-heavy sweep)
      FROM {SQL_DOCS_CANON} documents
      WHERE {SQL_MEDIA_BASE} % {PNG_DOC_MOD} = 0 AND text IS NOT NULL
    )
    SELECT i.doc_id,
           ANY_VALUE(i.width) AS width,
           ANY_VALUE(i.height) AS height,
           ANY_VALUE(i.n_channels) AS n_channels,
           CAST(SUM((i.base * 31
                     + (t.j // (i.width * i.n_channels)) * 17
                     + ((t.j % (i.width * i.n_channels)) // i.n_channels) * 7
                     + (t.j % i.n_channels) * 3) % 256) AS BIGINT)
               AS pixel_sum
    FROM img i,
         UNNEST(range(0, CAST(i.width AS BIGINT) * i.height * i.n_channels))
             AS t(j)
    GROUP BY i.doc_id
    """,
    doc="REAL PNG decode witness: synthesized image-tier payloads decoded "
    "via the pure-Python chunk-walk/inflate/unfilter path; dimensions and "
    "whole-image pixel sum hash-matched against a DuckDB pixel replay.",
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covers all four 8-bit color types (channels cycle with doc_id).
    Map-only: payload bytes stay in their scan partition; only the 5
    scalar columns leave the mapper."""
    docs = entity_table(spark, sf_dir, "documents")
    # Tier predicate at the scan (see multimodal_audio_stats): skip the
    # WAV/text synthesis for the ~86% of rows this query discards.
    media = with_media_column(
        # tier is keyed on media_base, not the raw id (SQL_MEDIA_BASE)
        docs.filter(F.pmod(F.col("doc_id"), _MEDIA_BASE_MOD) % PNG_DOC_MOD == 0)
    ).filter(F.col("media_meta.mime") == "image/png")

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_png(bytes(buf))
                rows.append(
                    (
                        int(doc_id),
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(px.shape[2]),
                        int(px.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_channels", "pixel_sum"],
            )

    return media.select("doc_id", "payload").mapInPandas(
        mapper, schema=_PNG_DECODE_SCHEMA
    )


# ---------------------------------------------------------------------------
# resize (thumbnail) stub

THUMB_SIDE = 8  # fixed-size "thumbnail": 8x8 mean-pooled byte grid

_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumbnail", T.ArrayType(T.FloatType())),
    ]
)


def _resize_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize — mean-pool the payload bytes onto a fixed THUMB_SIDE^2
    grid (stand-in for PIL ``Image.resize``; the Arrow/partition plumbing
    is what a real decoder would run inside)."""
    n_cells = THUMB_SIDE * THUMB_SIDE
    for pdf in batches:
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float32)
            if len(arr) == 0:
                arr = np.zeros(1, dtype=np.float32)
            # mean-pool into n_cells buckets (ragged-safe)
            idx = (np.arange(len(arr)) * n_cells) // len(arr)
            sums = np.bincount(idx, weights=arr, minlength=n_cells)
            cnts = np.maximum(np.bincount(idx, minlength=n_cells), 1)
            rows.append((doc_id, THUMB_SIDE, THUMB_SIDE, (sums / cnts).astype(np.float32).tolist()))
        yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])


def resize_media(media: DataFrame) -> DataFrame:
    return media.select("doc_id", "payload").mapInPandas(
        _resize_mapper, schema=_RESIZE_SCHEMA
    )


#: Shared byte-replay CTE prefix: regenerates the raw-tier thumbnail grid
#: (payload bytes mean-pooled into 64 cells, float32) in DuckDB — the
#: replay behind BOTH multimodal_resize (r5 promotion) and
#: multimodal_phash_groups (r6 promotion).  The raw-tier payload is the
#: UTF-8 text; r10 moved the byte extraction from ascii(substring(...))
#: (per-CHARACTER — only equals the byte on ASCII) to hex(encode(text))
#: nibble pairs, so the replay is byte-exact on ANY text.  The bucketing
#: `(i * 64) // n` is integer arithmetic, the per-bucket byte sums are
#: exact integers in float64, and both sides apply the identical
#: double->float32 cast (numpy astype vs CAST AS REAL).
_RAW_THUMB_CELLS_SQL = """
    doc_hex AS (
      SELECT doc_id, lower(hex(encode(text))) AS hx,
             greatest(octet_length(encode(text)), 1) AS n
      -- media domain: docs WITH text (r12 NULL-heavy sweep)
      FROM documents_canon WHERE text IS NOT NULL
    ),
    bytes AS (
      SELECT doc_id, t.i,
             CASE WHEN length(hx) = 0 THEN 0
                  ELSE (strpos('0123456789abcdef',
                          substring(hx, CAST(2 * t.i + 1 AS INT), 1)) - 1) * 16
                       + (strpos('0123456789abcdef',
                          substring(hx, CAST(2 * t.i + 2 AS INT), 1)) - 1)
             END AS b,
             n
      FROM doc_hex, UNNEST(range(0, n)) AS t(i)
    ),
    cellmeans AS (
      SELECT doc_id, (i * 64) // n AS cell,
             CAST(CAST(SUM(b) AS DOUBLE) / COUNT(*) AS REAL) AS m
      FROM bytes GROUP BY doc_id, (i * 64) // n
    ),
    grid AS (
      SELECT d.doc_id, g.cell, COALESCE(cm.m, CAST(0 AS REAL)) AS m
      FROM (SELECT DISTINCT doc_id FROM documents_canon
            WHERE text IS NOT NULL) d
      CROSS JOIN UNNEST(range(0, 64)) AS g(cell)
      LEFT JOIN cellmeans cm ON cm.doc_id = d.doc_id AND cm.cell = g.cell
    )
"""


@register(
    "multimodal_resize",
    # Promoted rows-only -> oracle in r5: see _RAW_THUMB_CELLS_SQL for the
    # byte/pooling replay argument — the pooled values hash-match exactly.
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    {_RAW_THUMB_CELLS_SQL}
    SELECT doc_id,
           CAST(8 AS INT) AS thumb_w, CAST(8 AS INT) AS thumb_h,
           CAST(64 AS INT) AS n_cells,
           round(CAST(MAX(CASE WHEN cell = 0 THEN m END) AS DOUBLE), 4)
               AS thumb_x0,
           round(SUM(CAST(m AS DOUBLE)) / 64, 4) AS thumb_mean
    FROM grid GROUP BY doc_id
    """,
    doc="Resize stub: payload bytes mean-pooled to a fixed 8x8 thumbnail "
    "grid; pooled-cell scalars hash-matched against a DuckDB byte replay.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``thumbnail`` array is reduced to scalar surrogates (first cell,
    mean, dim) for the registry-facing result — the driver's canonicalizer
    cannot hash list values.  ``resize_media`` keeps the full array and is
    unit-tested for shape/determinism."""
    docs = entity_table(spark, sf_dir, "documents")
    thumbs = resize_media(with_binary_column(docs))
    return thumbs.select(
        "doc_id",
        "thumb_w",
        "thumb_h",
        F.size("thumbnail").alias("n_cells"),
        F.round(F.element_at("thumbnail", 1).cast("double"), 4).alias("thumb_x0"),
        F.round(
            F.expr(
                "aggregate(thumbnail, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))"
            )
            / F.size("thumbnail"),
            4,
        ).alias("thumb_mean"),
    )


# ---------------------------------------------------------------------------
# frame sampling: one row per sampled frame (oracle-checked explode path)

FRAME_STRIDE_CHARS = 64
MAX_FRAMES_PER_DOC = 16


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(f - 1 AS INT) AS frame_idx,
           md5(substring(text, (f - 1) * {FRAME_STRIDE_CHARS} + 1,
                         {FRAME_STRIDE_CHARS})) AS frame_md5,
           CAST(least({FRAME_STRIDE_CHARS},
                      n_chars - (f - 1) * {FRAME_STRIDE_CHARS}) AS INT)
               AS frame_len
    FROM documents,
         UNNEST(range(1, least(CAST(ceil(n_chars / {FRAME_STRIDE_CHARS}.0)
                                    AS BIGINT),
                               {MAX_FRAMES_PER_DOC}) + 1)) AS t(f)
    -- media domain: docs WITH text (r12 NULL-heavy sweep)
    WHERE text IS NOT NULL
    """,
    doc="Frame sampling: payload cut into fixed-stride frames, one row "
    "per frame with content digest; fanout capped per document.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling expressed as a pure JVM explode — the
    oracle-checkable sibling of `_feature_mapper`'s in-Python frame CRCs
    (the stub decoder corpus is UTF-8 text, so character slicing IS byte
    slicing and DuckDB can mirror the digest exactly).

    The per-doc fanout is HARD-capped at {MAX_FRAMES_PER_DOC} frames: at
    100 TB an unbounded explode on payload length turns one hour-long
    "video" into millions of rows in a single task; the cap bounds task
    output (real pipelines sample frames, not take all of them).  Map-only
    — zero shuffles; frame digests feed the dedup family downstream."""
    docs = table(spark, sf_dir, "documents")
    n_frames = F.least(
        F.ceil(F.col("n_chars") / float(FRAME_STRIDE_CHARS)).cast("long"),
        F.lit(MAX_FRAMES_PER_DOC),
    )
    # Empty payloads emit ZERO frames: without the filter, n_frames = 0
    # makes Spark's sequence(1, 0) count DOWN ([1, 0] — two phantom
    # frames) while the oracle's range(1, 1) is empty (r10 null-shape
    # random sweep: 204 extra rows on a 25%-blank corpus).
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "text",
            "n_chars",
            F.explode(F.sequence(F.lit(1), n_frames)).alias("f"),
        )
        .select(
            "doc_id",
            (F.col("f") - 1).cast("int").alias("frame_idx"),
            F.expr(
                f"md5(substring(text, (f - 1) * {FRAME_STRIDE_CHARS} + 1,"
                f" {FRAME_STRIDE_CHARS}))"
            ).alias("frame_md5"),
            F.least(
                F.lit(FRAME_STRIDE_CHARS),
                F.col("n_chars") - (F.col("f") - 1) * FRAME_STRIDE_CHARS,
            )
            .cast("int")
            .alias("frame_len"),
        )
        .drop("_drop")
    )


# ---------------------------------------------------------------------------
# Audio-shaped path: PCM sample statistics

AUDIO_SAMPLE_RATE = 8000  # stub decode contract: treat bytes as 8 kHz PCM16

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("decoder", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _audio_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio decode with magic-byte dispatch, mirroring ``_decode_image``:
    payloads carrying RIFF/WAVE magic go through the REAL stdlib-``wave``
    parser (``codecs.decode_wav`` — true sample rate, channel count, and
    8/16/24/32-bit sample width from the fmt chunk); anything else falls
    back to the deterministic PCM16-reinterpretation stub, keeping the
    mapper total on arbitrary bytes (r4 VERDICT ask #2a).  Stats are over
    the interleaved sample stream in both paths."""
    for pdf in batches:
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(buf)
            decoder, rate, n_ch, x = "stub", AUDIO_SAMPLE_RATE, 1, None
            if is_wav(b):
                try:
                    frames, rate = decode_wav(b)
                    n_ch = int(frames.shape[1])
                    x = frames.astype(np.int64).reshape(-1)  # interleaved
                    decoder = "wav"
                except (wave.Error, EOFError, ValueError, struct.error):
                    x, rate, n_ch = None, AUDIO_SAMPLE_RATE, 1
            if x is None:
                if len(b) % 2:
                    b = b[:-1]  # PCM16 frames are 2 bytes
                x = np.frombuffer(b, dtype="<i2").astype(np.int64)
            n = int(x.size)
            if n == 0:
                rows.append((int(doc_id), decoder, 0, n_ch, rate, 0, 0.0, 0, 0, 0))
                continue
            rms = float(np.sqrt(np.mean((x.astype(np.float64)) ** 2)))
            peak = int(np.max(np.abs(x)))
            zc = int(np.sum((x[:-1] >= 0) != (x[1:] >= 0))) if n > 1 else 0
            rows.append(
                (
                    int(doc_id),
                    decoder,
                    n,
                    n_ch,
                    rate,
                    (n // n_ch) * 1000 // rate,
                    round(rms, 6),
                    peak,
                    int(np.sum(x * x)),
                    zc,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in _AUDIO_SCHEMA.fields],
        )


def extract_audio_stats(media: DataFrame) -> DataFrame:
    return media.select("doc_id", "payload").mapInPandas(
        _audio_mapper, schema=_AUDIO_SCHEMA
    )


@register(
    "multimodal_audio_stats",
    # The WAV tier's samples are pure integer arithmetic in doc_id, so the
    # real decode path IS oracle-checkable: DuckDB regenerates the
    # interleaved stream with unnest(range) and aggregates the same
    # integer stats the numpy side computes from the ACTUAL decoded PCM.
    # (Float rms stays out of the projection — integer columns hash
    # exactly.)  Upgraded from rows-only in r5 (r4 VERDICT ask #2b).
    oracle=f"""
    WITH audio AS (
      -- base = doc_id mod 2^31: the id-domain contract (SQL_MEDIA_BASE)
      SELECT doc_id, {SQL_MEDIA_BASE} AS base,
             CAST([8000, 16000, 44100][CAST({SQL_MEDIA_BASE} % 3 AS INT) + 1]
                  AS INT) AS sample_rate,
             CAST(1 + {SQL_MEDIA_BASE} % 2 AS INT) AS n_channels,
             CAST(20 + {SQL_MEDIA_BASE} % 50 AS BIGINT) AS n_frames
      -- media domain: docs WITH text (r12 NULL-heavy sweep)
      FROM {SQL_DOCS_CANON} documents
      WHERE {SQL_MEDIA_BASE} % {WAV_DOC_MOD} = 0
        AND {SQL_MEDIA_BASE} % {PNG_DOC_MOD} <> 0
        AND text IS NOT NULL
    ),
    samples AS (
      SELECT a.doc_id, a.sample_rate, a.n_channels, a.n_frames, t.i,
             ((a.base * 7 + (t.i // a.n_channels) * 13
               + (t.i % a.n_channels) * 5) % 201) - 100 AS v
      FROM audio a,
           UNNEST(range(0, a.n_frames * a.n_channels)) AS t(i)
    ),
    lagged AS (
      SELECT *, LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM samples
    )
    SELECT doc_id,
           'wav' AS decoder,
           COUNT(*) AS n_samples,
           ANY_VALUE(n_channels) AS n_channels,
           ANY_VALUE(sample_rate) AS sample_rate,
           CAST(ANY_VALUE(n_frames) * 1000 // ANY_VALUE(sample_rate)
                AS BIGINT) AS duration_ms,
           CAST(MAX(ABS(v)) AS BIGINT) AS peak,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v >= 0) <> (pv >= 0))
                         THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM lagged GROUP BY doc_id
    """,
    doc="Audio multimodal path: REAL stdlib-wave decode of synthesized "
    "RIFF/WAV payloads (8/16/24/32-bit, mono+stereo, 3 sample rates) -> "
    "integer sample statistics, hash-matched against a DuckDB replay of "
    "the deterministic sample function.",
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only the fixed-width stats ever shuffle (the waveform bytes stay
    in their scan partition); numpy crunches each decoded batch
    vectorized.  The mime filter selects the audio tier the way a real
    pipeline routes on metadata; the stub fallback path stays covered by
    unit tests and ``multimodal_full_features``."""
    docs = entity_table(spark, sf_dir, "documents")
    # Tier predicate pushed to the parquet scan: synthesizing then
    # discarding the other tiers' payloads (PNG encode + zlib for every
    # 7th doc) would be wasted mapper work the post-mapInPandas mime
    # filter cannot push back through (round-5 review).  The mime filter
    # stays as the semantic routing contract; it is a no-op here.
    audio_docs = docs.filter(
        # tier is keyed on media_base, not the raw id (SQL_MEDIA_BASE)
        (F.pmod(F.col("doc_id"), _MEDIA_BASE_MOD) % WAV_DOC_MOD == 0)
        & (F.pmod(F.col("doc_id"), _MEDIA_BASE_MOD) % PNG_DOC_MOD != 0)
    )
    media = with_media_column(audio_docs).filter(
        F.col("media_meta.mime") == "audio/wav"
    )
    return extract_audio_stats(media).select(
        "doc_id",
        "decoder",
        "n_samples",
        "n_channels",
        "sample_rate",
        "duration_ms",
        "peak",
        "sum_sq",
        "zero_crossings",
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-dup over media payloads (dedup x multimodal)


PHASH_BAND_BITS = 16  # exact-match band width for hamming candidate search


@register(
    "multimodal_phash_groups",
    # Promoted rows-only -> oracle in r6: the signature is a pure function
    # of the raw-tier thumbnail grid that _RAW_THUMB_CELLS_SQL already
    # replays byte-for-byte (r5's multimodal_resize argument), and every
    # step after it is deterministic — the median is the mean of the two
    # middle order statistics (float32 addition replayed as
    # CAST(a + b AS REAL): the float64 sum of two float32s is exact, so
    # rounding it to REAL equals Spark's float-domain Add), the bit is a
    # plain comparison, and the band fold is GROUP BY + HAVING.
    oracle=f"""
    WITH documents_canon AS {SQL_DOCS_CANON},
    {_RAW_THUMB_CELLS_SQL},
    ranked AS (
      SELECT doc_id, cell, m,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY m) AS rn
      FROM grid
    ),
    med AS (
      SELECT doc_id,
             CAST(CAST(MAX(CASE WHEN rn = 32 THEN m END)
                       + MAX(CASE WHEN rn = 33 THEN m END) AS REAL)
                  AS DOUBLE) / 2.0 AS med
      FROM ranked GROUP BY doc_id
    ),
    sig AS (
      SELECT g.doc_id,
             string_agg(CASE WHEN g.m > med.med THEN '1' ELSE '0' END, ''
                        ORDER BY g.cell) AS phash
      FROM grid g JOIN med ON med.doc_id = g.doc_id
      GROUP BY g.doc_id
    )
    SELECT substring(phash, 1, {PHASH_BAND_BITS}) AS band,
           CAST(COUNT(*) AS INT) AS n_docs,
           CAST(COUNT(DISTINCT phash) AS INT) AS n_distinct_phash,
           MIN(doc_id) AS rep_doc_id
    FROM sig GROUP BY band HAVING COUNT(*) >= 2
    """,
    doc="Perceptual-hash near-dup candidates over media payloads: 8x8 "
    "thumbnail -> 64-bit above-median bit signature (JVM exprs) -> "
    "16-bit band groupBy; bands holding >= 2 docs are the candidate "
    "groups for hamming verification.",
)
def multimodal_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash-style image dedup (public methodology: average/median hash
    family): decode + downscale to an 8x8 grid, fingerprint each cell as
    above/below the per-image median, then find near-duplicates the way
    hamming search scales — exact match on a bit BAND proposes candidate
    groups (any pair within hamming distance d shares at least one of
    64/band_bits bands untouched), and only candidates pay the full
    64-bit comparison.  Byte-identical media collide on the whole
    signature (n_distinct_phash = 1 in their band).

    Scale shape: thumbnails come from the Arrow-batched resize stub; the
    signature is pure JVM array lambdas (sort for the median,
    transform+concat for bits); the only shuffle carries (band, 64-char
    signature, doc_id) — never payload bytes.  Band groups are
    candidate-sized; the same hot-bucket cap as operators/dedup.py
    applies if a degenerate corpus floods one band."""
    docs = entity_table(spark, sf_dir, "documents")
    thumbs = resize_media(with_binary_column(docs))
    n_cells = THUMB_SIDE * THUMB_SIDE
    srt = F.sort_array(F.col("thumbnail"))
    median = (
        F.element_at(srt, n_cells // 2) + F.element_at(srt, n_cells // 2 + 1)
    ) / F.lit(2.0)
    bits = F.array_join(
        F.transform(
            F.col("thumbnail"),
            lambda x: F.when(x > F.col("med"), "1").otherwise("0"),
        ),
        "",
    )
    sig = thumbs.withColumn("med", median).select(
        "doc_id", bits.alias("phash")
    )
    return (
        sig.groupBy(F.substring("phash", 1, PHASH_BAND_BITS).alias("band"))
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.countDistinct("phash").cast("int").alias("n_distinct_phash"),
            F.min("doc_id").alias("rep_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )

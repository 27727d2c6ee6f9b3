"""Spec-correct MurmurHash3_x86_32 — the hash behind ``pyspark.ml``'s
``HashingTF`` term indexing (seed 42).

Why not ``F.hash``: Spark SQL's ``Murmur3Hash`` expression uses the
*block-lenient* byte mixer (``hashUnsafeBytes``: tail bytes folded as
whole little-endian words), while ``ml.feature.HashingTF`` hashes terms
with the spec-faithful variant (``hashUnsafeBytes2``: 1-3 tail bytes
mixed per the reference algorithm).  The two agree only when the UTF-8
byte length is a multiple of 4 (verified empirically in
tests/test_murmur3.py), so an ML-side replay must implement the spec
version — this module.

Used by the ``ml_minhash_neardup`` certificate (r11 VERDICT ask #1) to
recompute ``HashingTF`` feature buckets independently of pyspark.ml and
verify the emitted pair similarities are the true Jaccard of the hashed
shingle sets.
"""

from __future__ import annotations

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def murmur3_x86_32(data: bytes, seed: int = 42) -> int:
    """MurmurHash3_x86_32 (Austin Appleby's reference algorithm) of
    ``data``; returns the SIGNED 32-bit result (Java/Scala semantics, so
    it composes with ``non_negative_mod`` exactly like HashingTF does)."""
    h = seed & _MASK
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[n:]
    if tail:
        k = 0
        if len(tail) >= 3:
            k ^= tail[2] << 16
        if len(tail) >= 2:
            k ^= tail[1] << 8
        k ^= tail[0]
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def hashing_tf_bucket(term: str, num_features: int) -> int:
    """The ``HashingTF`` feature index of ``term``:
    ``nonNegativeMod(murmur3(utf8(term), seed=42), numFeatures)``.
    Python's ``%`` is already the mathematical (non-negative) mod, which
    matches Scala's ``Utils.nonNegativeMod`` for positive moduli."""
    return murmur3_x86_32(term.encode("utf-8")) % num_features

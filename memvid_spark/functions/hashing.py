"""Deterministic, engine-portable hashing primitives.

memvid uses blake3 for content dedup (src/memvid/mutation.rs:3302-3316) and
FxHash/SipHash for token hashing. We need hashes that are (a) stable across
Spark executors and versions, and (b) reproducible in ANSI SQL so the DuckDB
oracle can replay every derived value. md5 is the only hash both engines
share bit-for-bit, so all sketch math is built on a 60-bit integer carved
from md5 hex (15 hex chars keeps us inside signed-64 range; ANSI-mode safe).

Everything is a Column expression — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_HEX_CHARS = 15  # 60 bits < 2^63, safe for signed BIGINT in both engines


def hash64(col: Column | str) -> Column:
    """Stable 60-bit integer hash of a string.

    Twin SQL: ('0x' || substr(md5(x),1,15))::bigint
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def hash64_seeded(col: Column | str, seed: Column | int) -> Column:
    """Seeded variant for minhash families: hash64(concat(x, '#', seed)).

    Twin SQL: ('0x' || substr(md5(x || '#' || seed),1,15))::bigint
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(seed) if isinstance(seed, int) else seed
    return hash64(F.concat(c, F.lit("#"), s.cast("string")))


def content_sha256(col: Column | str) -> Column:
    """Content fingerprint for exact dedup (blake3 analogue)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c, 256)


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit integer sketches.

    Twin SQL: bit_count(xor(a,b)::bigint)
    """
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ac.bitwiseXOR(bc))

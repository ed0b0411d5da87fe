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


def _minhash_family_member(s: int) -> tuple[int, int, int]:
    """Fixed (a, b, c) mixing constants for family member ``s``, carved
    from md5 so they are arbitrary-but-deterministic. a and b are odd and
    < 2^30, which bounds a*(h>>30) + b*(h&mask) + c under 2^62 — exact in
    signed-64 arithmetic in both Spark and DuckDB (no overflow, no
    modulo divergence)."""
    import hashlib

    d = hashlib.md5(f"minhash-family-{s}".encode()).hexdigest()
    a = (int(d[0:8], 16) | 1) & 0x3FFFFFFF
    b = (int(d[8:16], 16) | 1) & 0x3FFFFFFF
    c = int(d[16:24], 16) & 0x3FFFFFFF
    return a, b, c


MINHASH_FAMILY = [_minhash_family_member(s) for s in range(16)]
_LO_MASK = (1 << 30) - 1  # low 30 bits of the 60-bit base hash
_MERSENNE31 = (1 << 31) - 1  # Carter-Wegman modulus


def hash64_affine(h: Column, seed: int) -> Column:
    """Seed-``s`` member of a Carter-Wegman family over a single 60-bit
    base hash: (a*(h>>30) + b*(h&mask) + c) mod (2^31-1). One md5 per
    input serves every family member — 8x fewer digests than hashing
    (x || '#' || seed) per seed. The mod is essential, not decoration:
    without it the map is near-monotone in h, the per-set argmin
    coincides across seeds, and LSH band keys collide quadratically
    (measured: 11M candidate pairs for 2.6k true pairs at the 100x
    probe). Wrapping ~2^29 times decorrelates the seeds.

    Twin SQL: :func:`hash64_affine_sql`.
    """
    a, b, c = MINHASH_FAMILY[seed]
    hi = F.shiftright(h, 30)
    lo = h.bitwiseAND(F.lit(_LO_MASK))
    return (F.lit(a) * hi + F.lit(b) * lo + F.lit(c)) % F.lit(_MERSENNE31)


def hash64_affine_sql(h_expr: str, seed: int) -> str:
    """DuckDB twin of :func:`hash64_affine` over SQL expression ``h_expr``
    (generated from the same constants so the engines cannot drift)."""
    a, b, c = MINHASH_FAMILY[seed]
    return (
        f"(({a} * (({h_expr}) >> 30) + {b} * (({h_expr}) & {_LO_MASK}) + {c})"
        f" % {_MERSENNE31})"
    )


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

"""Pure-stdlib Ed25519 (RFC 8032) — sign and verify.

The reference gates capacity tickets and model manifests on Ed25519
signatures (src/signature.rs:70-106 via ed25519-dalek's
``verify_strict``). This container has no crypto library, and the
algorithm is fully public (RFC 8032, Bernstein et al. 2011), so the
primitive is implemented here directly over Python big ints: the
twisted-Edwards group in extended coordinates, SHA-512 key expansion,
and the strict (non-malleable, canonical-encoding) verification
equation ``s·B == R + k·A``.

Driver-side only — signatures are checked once per ticket/manifest,
never per row, so plain big-int arithmetic is the right tool (no
constant-time requirement for verification; signing here exists for
tests and a control-plane analogue).
"""

from __future__ import annotations

import hashlib

__all__ = ["publickey", "sign", "verify"]

_P = 2**255 - 19  # field prime
_Q = 2**252 + 27742317777372353535851937790883648493  # group order
_D = (-121665 * pow(121666, _P - 2, _P)) % _P  # curve constant
_I = pow(2, (_P - 1) // 4, _P)  # sqrt(-1)

_BY = (4 * pow(5, _P - 2, _P)) % _P


def _sha512(m: bytes) -> bytes:
    return hashlib.sha512(m).digest()


def _xrecover(y: int) -> int:
    xx = (y * y - 1) * pow(_D * y * y + 1, _P - 2, _P) % _P
    x = pow(xx, (_P + 3) // 8, _P)
    if (x * x - xx) % _P != 0:
        x = x * _I % _P
    if x % 2 != 0:
        x = _P - x
    return x


_BX = _xrecover(_BY)
_B = (_BX, _BY, 1, _BX * _BY % _P)  # base point, extended coordinates
_ZERO = (0, 1, 1, 0)  # neutral element


def _add(p, q):
    # Extended-coordinates addition (RFC 8032 §5.1.4)
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = (y1 - x1) * (y2 - x2) % _P
    b = (y1 + x1) * (y2 + x2) % _P
    c = 2 * t1 * t2 * _D % _P
    dd = 2 * z1 * z2 % _P
    e, f, g, h = b - a, dd - c, dd + c, b + a
    return (e * f % _P, g * h % _P, f * g % _P, e * h % _P)


def _mul(p, e: int):
    q = _ZERO
    while e:
        if e & 1:
            q = _add(q, p)
        p = _add(p, p)
        e >>= 1
    return q


def _compress(p) -> bytes:
    x, y, z, _ = p
    zi = pow(z, _P - 2, _P)
    x, y = x * zi % _P, y * zi % _P
    return (y | ((x & 1) << 255)).to_bytes(32, "little")


def _decompress(s: bytes):
    """Canonical point decoding; None for invalid/non-canonical input."""
    n = int.from_bytes(s, "little")
    y = n & ((1 << 255) - 1)
    sign = n >> 255
    if y >= _P:
        return None  # non-canonical y
    xx = (y * y - 1) * pow(_D * y * y + 1, _P - 2, _P) % _P
    x = pow(xx, (_P + 3) // 8, _P)
    if (x * x - xx) % _P != 0:
        x = x * _I % _P
    if (x * x - xx) % _P != 0:
        return None  # not on the curve
    if x == 0 and sign:
        return None  # -0 is non-canonical
    if x & 1 != sign:
        x = _P - x
    return (x, y, 1, x * y % _P)


def _clamp(h: bytes) -> int:
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    return a


def publickey(seed: bytes) -> bytes:
    """32-byte public key from a 32-byte seed."""
    if len(seed) != 32:
        raise ValueError("ed25519 seed must be 32 bytes")
    return _compress(_mul(_B, _clamp(_sha512(seed))))


def sign(message: bytes, seed: bytes, pub: bytes | None = None) -> bytes:
    """64-byte signature (R || s) over ``message``."""
    if len(seed) != 32:
        raise ValueError("ed25519 seed must be 32 bytes")
    h = _sha512(seed)
    a, prefix = _clamp(h), h[32:]
    if pub is None:
        pub = _compress(_mul(_B, a))
    r = int.from_bytes(_sha512(prefix + message), "little") % _Q
    big_r = _compress(_mul(_B, r))
    k = int.from_bytes(_sha512(big_r + pub + message), "little") % _Q
    s = (r + k * a) % _Q
    return big_r + s.to_bytes(32, "little")


def verify(message: bytes, signature: bytes, pub: bytes) -> bool:
    """Strict verification: canonical encodings, s < group order, and the
    non-cofactored equation s·B == R + k·A (ed25519-dalek
    ``verify_strict`` semantics)."""
    if len(signature) != 64 or len(pub) != 32:
        return False
    big_r = _decompress(signature[:32])
    big_a = _decompress(pub)
    if big_r is None or big_a is None:
        return False
    s = int.from_bytes(signature[32:], "little")
    if s >= _Q:
        return False  # malleable / non-canonical scalar
    k = int.from_bytes(_sha512(signature[:32] + pub + message), "little") % _Q
    left = _mul(_B, s)
    right = _add(big_r, _mul(big_a, k))
    x1, y1, z1, _ = left
    x2, y2, z2, _ = right
    return (x1 * z2 - x2 * z1) % _P == 0 and (y1 * z2 - y2 * z1) % _P == 0

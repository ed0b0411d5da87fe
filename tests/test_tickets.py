"""Capacity tickets + Ed25519 (ticket.rs:135-260, signature.rs,
types/common.rs:76-85). The signing side plays control plane; the store
only ever sees public material."""

import binascii

import pytest

from memvid_spark.functions import ed25519
from memvid_spark.operators import tickets as T

SEED = bytes(range(32))
PUB = ed25519.publickey(SEED)
MEM_ID = "8f2c5a44-1111-2222-3333-444455556666"


# -- primitive: RFC 8032 §7.1 vectors ------------------------------------

RFC_VECTORS = [
    (
        "9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60",
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
        "",
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e06522490155"
        "5fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b",
    ),
    (
        "4ccd089b28ff96da9db6c346ec114e0f5b8a319f35aba624da8cf6ed4fb8a6fb",
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
        "72",
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da"
        "085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00",
    ),
    (
        "c5aa8df43f9f837bedb7442f31dcb7b166d38535076f094b85ce3a2e0b4458f7",
        "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
        "af82",
        "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac"
        "18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a",
    ),
]


@pytest.mark.parametrize("seed,pub,msg,sig", RFC_VECTORS)
def test_rfc8032_vectors(seed, pub, msg, sig):
    seed, pub, msg, sig = (
        binascii.unhexlify(x) for x in (seed, pub, msg, sig)
    )
    assert ed25519.publickey(seed) == pub
    assert ed25519.sign(msg, seed) == sig
    assert ed25519.verify(msg, sig, pub)
    assert not ed25519.verify(msg + b"x", sig, pub)
    flipped = bytearray(sig)
    flipped[0] ^= 1
    assert not ed25519.verify(msg, bytes(flipped), pub)


def test_noncanonical_scalar_rejected():
    msg = b"hello"
    sig = ed25519.sign(msg, SEED)
    s = int.from_bytes(sig[32:], "little")
    # s + group order is the classic malleability twin — strict mode
    # must reject it even though the cofactored equation would hold
    malleable = sig[:32] + (
        (s + 2**252 + 27742317777372353535851937790883648493)
        % 2**256
    ).to_bytes(32, "little")
    assert not ed25519.verify(msg, malleable, PUB)


# -- canonical payload (serde_json byte compatibility) -------------------

def test_ticket_message_bytes_layout():
    assert T.ticket_message_bytes(MEM_ID, "memvid.com", 1, 86400, 1024) == (
        b'{"version":1,"memory_id":"' + MEM_ID.encode()
        + b'","issuer":"memvid.com","seq_no":1,"expires_in":86400,'
        b'"capacity_bytes":1024}'
    )
    # absent capacity serializes as null, not omitted
    assert b'"capacity_bytes":null' in T.ticket_message_bytes(
        MEM_ID, "x", 2, 0, None
    )


# -- state machine -------------------------------------------------------

def test_apply_ticket_sequence_monotonic():
    ref = T.TicketRef()
    ref = T.apply_ticket(ref, T.Ticket(issuer="t", seq_no=1))
    assert ref.seq_no == 1 and not ref.verified
    with pytest.raises(T.TicketError):
        T.apply_ticket(ref, T.Ticket(issuer="t", seq_no=1))


def test_signed_ticket_roundtrip_and_rejections():
    tk = T.issue_ticket(SEED, MEM_ID, "memvid.com", 1, 86400, 4096)
    ref = T.apply_signed_ticket(T.TicketRef(), tk, PUB, MEM_ID)
    assert ref.verified and ref.capacity_bytes == 4096

    with pytest.raises(T.TicketError, match="not bound"):
        T.apply_signed_ticket(T.TicketRef(), tk, PUB, None)
    with pytest.raises(T.TicketError, match="does not match"):
        T.apply_signed_ticket(T.TicketRef(), tk, PUB, "other-id")
    forged = T.SignedTicket(
        issuer="memvid.com", seq_no=2, expires_in_secs=86400,
        capacity_bytes=2**40, memory_id=MEM_ID, signature=tk.signature,
    )
    with pytest.raises(T.TicketError, match="signature"):
        T.apply_signed_ticket(T.TicketRef(), forged, PUB, MEM_ID)
    with pytest.raises(T.TicketError, match="sequence"):
        T.apply_signed_ticket(ref, tk, PUB, MEM_ID)


def test_capacity_limit_tiers():
    assert T.capacity_limit(T.TicketRef(), "free") == 50 * 1024 * 1024
    assert T.capacity_limit(T.TicketRef(), "dev") == 2 * 1024**3
    assert T.capacity_limit(T.TicketRef(capacity_bytes=777), "free") == 777


def test_check_capacity_gate():
    ref = T.TicketRef(capacity_bytes=100)
    T.check_capacity(ref, 40, 60)  # exactly at the limit: allowed
    with pytest.raises(T.CapacityExceeded) as e:
        T.check_capacity(ref, 40, 61)
    assert e.value.limit == 100 and e.value.required == 61


# -- model manifests (signature.rs:89-106) -------------------------------

def test_model_manifest_verify():
    msg_args = ("bge-small", "1.5", "ab" * 32, 12345)
    sig = ed25519.sign(T.model_message_bytes(*msg_args), SEED)
    T.verify_model_manifest(PUB, *msg_args, sig)
    with pytest.raises(T.TicketError):
        T.verify_model_manifest(PUB, "bge-small", "1.6", "ab" * 32, 12345, sig)


# -- facade integration --------------------------------------------------

def test_facade_ticket_flow(spark):
    import base64

    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    mv._tier = "free"
    # shrink the effective limit via a signed ticket so the gate is
    # testable without 50 MB of puts
    mv.bind(MEM_ID, base64.b64encode(PUB).decode())
    tk = T.issue_ticket(SEED, MEM_ID, "memvid.com", 1, 0, 64)
    mv.apply_signed_ticket(tk)
    assert mv.get_capacity() == 64

    assert mv.put("0123456789" * 6) is not None  # 60 bytes
    with pytest.raises(T.CapacityExceeded):
        mv.put("abcdefgh")  # 60 + 8 > 64
    # dedup skip consumes nothing
    assert mv.put("0123456789" * 6) is None

    st = mv.stats()
    assert st["capacity_bytes"] == 64
    assert st["remaining_capacity_bytes"] == 4
    assert st["seq_no"] == 1 and st["ticket_verified"]
    assert st["payload_bytes"] == 60 and st["frame_count"] == 1

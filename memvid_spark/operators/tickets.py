"""Capacity tickets and signed model manifests.

Reference surface: ``stats`` / ``apply_ticket`` / ``apply_signed_ticket``
(src/memvid/ticket.rs:135-260) gate a store's write capacity on
sequence-monotonic tickets; signed tickets carry an Ed25519 signature
over a canonical JSON payload (src/signature.rs:31-87) checked against
the control plane's public key, and model manifests use the same scheme
(src/signature.rs:89-106, src/models.rs). Tier defaults mirror
src/types/common.rs:76-85 (Free 50 MB / Dev 2 GB / Enterprise 10 GB).

The canonical message is the serde_json encoding of the payload struct:
compact separators, fields in declaration order, ``null`` for an absent
capacity — reproduced byte-for-byte by :func:`ticket_message_bytes` so
signatures interoperate. The trusted public key is injectable (the
reference embeds its control-plane key; an engine rebuild must not
hardcode someone else's trust root), and :func:`issue_ticket` is the
control-plane analogue used by tests.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass

from ..functions import ed25519

TIER_CAPACITY_BYTES = {
    "free": 50 * 1024 * 1024,
    "dev": 2 * 1024 * 1024 * 1024,
    "enterprise": 10 * 1024 * 1024 * 1024,
}
_SIGNING_SCHEMA_VERSION = 1


class TicketError(ValueError):
    """Signature / sequence / binding violation."""


class CapacityExceeded(RuntimeError):
    def __init__(self, current: int, limit: int, required: int):
        super().__init__(
            f"capacity exceeded: current={current} limit={limit} "
            f"required={required}"
        )
        self.current, self.limit, self.required = current, limit, required


@dataclass
class Ticket:
    """Unsigned ticket (types/ticket.rs Ticket)."""

    issuer: str
    seq_no: int
    expires_in_secs: int = 0
    capacity_bytes: int | None = None


@dataclass
class SignedTicket(Ticket):
    """Ticket bound to a memory id with an Ed25519 signature
    (types/ticket.rs SignedTicket)."""

    memory_id: str = ""
    signature: bytes = b""


def ticket_message_bytes(
    memory_id: str,
    issuer: str,
    seq_no: int,
    expires_in: int,
    capacity_bytes: int | None,
) -> bytes:
    """serde_json-compatible canonical payload (signature.rs:31-49)."""
    payload = {
        "version": _SIGNING_SCHEMA_VERSION,
        "memory_id": memory_id,
        "issuer": issuer,
        "seq_no": seq_no,
        "expires_in": expires_in,
        "capacity_bytes": capacity_bytes,
    }
    return json.dumps(payload, separators=(",", ":")).encode()


def model_message_bytes(
    name: str, model_version: str, checksum_hex: str, size_bytes: int
) -> bytes:
    """Canonical model-manifest payload (signature.rs:51-68)."""
    payload = {
        "version": _SIGNING_SCHEMA_VERSION,
        "name": name,
        "model_version": model_version,
        "checksum": checksum_hex,
        "size_bytes": size_bytes,
    }
    return json.dumps(payload, separators=(",", ":")).encode()


def parse_public_key_base64(encoded: str) -> bytes:
    """Base64 → 32-byte verifying key (signature.rs:113-130)."""
    raw = base64.b64decode(encoded.strip(), validate=True)
    if len(raw) != 32:
        raise TicketError(
            f"public key must be 32 bytes, got {len(raw)}"
        )
    return raw


def verify_ticket_signature(
    pubkey: bytes, ticket: SignedTicket
) -> None:
    """Raises TicketError unless the signature checks out
    (signature.rs:70-87 verify_strict semantics)."""
    msg = ticket_message_bytes(
        ticket.memory_id,
        ticket.issuer,
        ticket.seq_no,
        ticket.expires_in_secs,
        ticket.capacity_bytes,
    )
    if len(ticket.signature) != 64:
        raise TicketError("signature must be exactly 64 bytes")
    if not ed25519.verify(msg, ticket.signature, pubkey):
        raise TicketError("ticket signature mismatch")


def verify_model_manifest(
    pubkey: bytes,
    name: str,
    model_version: str,
    checksum_hex: str,
    size_bytes: int,
    signature: bytes,
) -> None:
    msg = model_message_bytes(name, model_version, checksum_hex, size_bytes)
    if len(signature) != 64 or not ed25519.verify(msg, signature, pubkey):
        raise TicketError("model signature mismatch")


def issue_ticket(
    signing_seed: bytes,
    memory_id: str,
    issuer: str,
    seq_no: int,
    expires_in_secs: int = 0,
    capacity_bytes: int | None = None,
) -> SignedTicket:
    """Control-plane analogue: sign a ticket with the 32-byte seed whose
    public key the store trusts. Test/ops tooling — never on the data
    path."""
    msg = ticket_message_bytes(
        memory_id, issuer, seq_no, expires_in_secs, capacity_bytes
    )
    return SignedTicket(
        issuer=issuer,
        seq_no=seq_no,
        expires_in_secs=expires_in_secs,
        capacity_bytes=capacity_bytes,
        memory_id=memory_id,
        signature=ed25519.sign(msg, signing_seed),
    )


@dataclass
class TicketRef:
    """Applied-ticket state carried by the store (types TicketRef)."""

    issuer: str = ""
    seq_no: int = 0
    expires_in_secs: int = 0
    capacity_bytes: int = 0  # 0 = fall back to tier default
    verified: bool = False


def apply_ticket(ref: TicketRef, ticket: Ticket) -> TicketRef:
    """Unsigned apply (ticket.rs:135-157): sequence must strictly
    increase; the result is marked unverified."""
    if ticket.seq_no <= ref.seq_no:
        raise TicketError(
            f"ticket sequence must exceed {ref.seq_no}, got {ticket.seq_no}"
        )
    return TicketRef(
        issuer=ticket.issuer,
        seq_no=ticket.seq_no,
        expires_in_secs=ticket.expires_in_secs,
        capacity_bytes=ticket.capacity_bytes or 0,
        verified=False,
    )


def apply_signed_ticket(
    ref: TicketRef,
    ticket: SignedTicket,
    pubkey: bytes,
    memory_id: str | None,
) -> TicketRef:
    """Signed apply (ticket.rs:189-260): the store must be bound, the
    ticket's memory id must match, the signature must verify, and the
    sequence must strictly increase."""
    if not memory_id:
        raise TicketError(
            "cannot apply signed ticket: memory is not bound"
        )
    if ticket.memory_id != memory_id:
        raise TicketError(
            f"ticket memory_id {ticket.memory_id} does not match "
            f"this memory {memory_id}"
        )
    verify_ticket_signature(pubkey, ticket)
    if ticket.seq_no <= ref.seq_no:
        raise TicketError(
            f"ticket sequence must exceed {ref.seq_no}, got {ticket.seq_no}"
        )
    return TicketRef(
        issuer=ticket.issuer,
        seq_no=ticket.seq_no,
        expires_in_secs=ticket.expires_in_secs,
        capacity_bytes=ticket.capacity_bytes or 0,
        verified=True,
    )


def capacity_limit(ref: TicketRef, tier: str = "free") -> int:
    """Applied-ticket capacity, else the tier default
    (mutation.rs:2848-2854)."""
    if ref.capacity_bytes:
        return ref.capacity_bytes
    return TIER_CAPACITY_BYTES[tier]


def check_capacity(
    ref: TicketRef, current_bytes: int, incoming_bytes: int, tier: str = "free"
) -> None:
    """Write-path gate (mutation.rs:3407-3415): projected payload size
    must stay within the capacity limit."""
    limit = capacity_limit(ref, tier)
    if current_bytes + incoming_bytes > limit:
        raise CapacityExceeded(current_bytes, limit, incoming_bytes)

"""ACL filtering: tenant + visibility + role grants, audit vs enforce.

Reference: src/memvid/acl.rs:1-60+ — per-frame ACL attributes from
extra_metadata keys (src/lib.rs:195-197), applied post-retrieval in
Audit (annotate) or Enforce (filter) mode (src/memvid/search/mod.rs:266-274).

Relational form: the ACL check is a boolean predicate of frame columns
vs a (broadcast) caller context — Catalyst pushes the enforce filter
into the scan, so denied rows never leave the executors.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class AclContext:
    tenant: str
    principal: str = ""
    roles: list[str] = field(default_factory=list)
    groups: list[str] = field(default_factory=list)


def acl_columns_from_doc_id(doc_id: Column) -> list[Column]:
    """Deterministic demo ACL attributes (stand-in for extra_metadata):
    tenant by id mod 3, every 5th doc private, roles alternate
    analyst/admin. Twin SQL in registry.py."""
    return [
        F.concat(F.lit("tenant"), (doc_id % 3).cast("string")).alias("acl_tenant"),
        F.when(doc_id % 5 == 0, "private").otherwise("public").alias("acl_visibility"),
        F.when(doc_id % 2 == 0, "analyst").otherwise("admin").alias("acl_role"),
    ]


def allowed(ctx: AclContext) -> Column:
    """The grant predicate: same tenant AND (public OR caller holds the
    required role)."""
    role_ok = F.col("acl_role").isin(ctx.roles) if ctx.roles else F.lit(False)
    return (F.col("acl_tenant") == ctx.tenant) & (
        (F.col("acl_visibility") == "public") | role_ok
    )


def enforce(frames: DataFrame, ctx: AclContext) -> DataFrame:
    """Enforce mode: drop rows the context may not see."""
    return frames.filter(allowed(ctx))


def audit(frames: DataFrame, ctx: AclContext) -> DataFrame:
    """Audit mode: keep everything, annotate the decision."""
    return frames.withColumn("acl_allowed", allowed(ctx))

"""Reciprocal-rank fusion of k ranked hit lists.

Reference: src/memvid/ask.rs:19,1381-1432 — rrf_k = 60,
score(doc) = sum over lists of 1/(60 + rank); ties broken by more list
memberships, then by id.

Scale: each input list is already top-N (small); fusion is a unionByName
of k small DataFrames + one groupBy — negligible shuffle. The heavy
retrieval happened upstream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

RRF_K = 60


def with_rank(hits: DataFrame, order, id_col: str = "doc_id") -> DataFrame:
    """Attach a dense 1-based rank to a hit list given a total order."""
    w = Window.orderBy(*order)
    return hits.select(F.col(id_col), F.row_number().over(w).alias("rank"))


def rrf_fuse(
    lists: list[DataFrame], id_col: str = "doc_id", k: int = 10, rrf_k: int = RRF_K
) -> DataFrame:
    """Fuse ranked lists (each with columns [id_col, rank]) via RRF.

    Output: (id_col, rrf double round6, n_lists) top-k ordered by
    (rrf desc, n_lists desc, id asc).
    """
    tagged = [
        df.select(F.col(id_col), (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("c"))
        for df in lists
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), tagged)
    fused = unioned.groupBy(id_col).agg(
        F.round(F.sum("c"), 6).alias("rrf"), F.count("*").alias("n_lists")
    )
    return fused.orderBy(
        F.col("rrf").desc(), F.col("n_lists").desc(), F.col(id_col).asc()
    ).limit(k)

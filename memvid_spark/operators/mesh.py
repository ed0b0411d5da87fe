"""Logic-Mesh graph operators: typed entity graph + bounded-hop traversal.

Reference lineage:
- MeshNode / MeshEdge with typed links (src/types/logic_mesh.rs:27-80,
  135-178); adjacency + traversal `follow(start, link, hops)`
  (logic_mesh.rs:427-441, 459-514)
- hybrid_search planner: keyword patterns → VectorOnly/GraphOnly/Hybrid
  (src/graph_search.rs:94-141, 311-440)

Representation: ``nodes(node_id, name, kind)`` and
``edges(src, dst, link_type)`` DataFrames. ``mesh_from_tpch`` derives a
deterministic demo graph from the driver's star schema (customers and
suppliers LOCATED_IN nations, nations PART_OF regions).

Scale: traversal is ≤N broadcast-joins of a (small) frontier against the
edge table — the frontier is broadcast, the edge table never moves; at
100 TB the edge table is bucketed by ``src`` so each hop is a pruned
scan. No driver-side adjacency map.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


def mesh_from_tpch(customer, supplier, nation, region) -> tuple[DataFrame, DataFrame]:
    nodes = (
        customer.select(
            F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("node_id"),
            F.col("c_name").alias("name"),
            F.lit("Person").alias("kind"),
        )
        .unionByName(
            supplier.select(
                F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias(
                    "node_id"
                ),
                F.col("s_name").alias("name"),
                F.lit("Org").alias("kind"),
            )
        )
        .unionByName(
            nation.select(
                F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias(
                    "node_id"
                ),
                F.col("n_name").alias("name"),
                F.lit("Location").alias("kind"),
            )
        )
        .unionByName(
            region.select(
                F.concat(F.lit("region:"), F.col("r_regionkey").cast("string")).alias(
                    "node_id"
                ),
                F.col("r_name").alias("name"),
                F.lit("Location").alias("kind"),
            )
        )
    )
    edges = (
        customer.select(
            F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string")).alias("dst"),
            F.lit("LOCATED_IN").alias("link_type"),
        )
        .unionByName(
            supplier.select(
                F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias("src"),
                F.concat(F.lit("nation:"), F.col("s_nationkey").cast("string")).alias("dst"),
                F.lit("LOCATED_IN").alias("link_type"),
            )
        )
        .unionByName(
            nation.select(
                F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("src"),
                F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")).alias("dst"),
                F.lit("PART_OF").alias("link_type"),
            )
        )
    )
    return nodes, edges


def follow(
    edges: DataFrame,
    start_ids: DataFrame,
    hops: int,
    link_type: str | None = None,
    direction: str = "out",
) -> DataFrame:
    """Nodes reachable from ``start_ids(node_id)`` in 1..hops steps.

    Iterative frontier-broadcast join (logic_mesh.rs:459-514 walks an
    adjacency list; relationally each hop is one equi-join). Output:
    (node_id, hop) with the MINIMUM hop per node.
    """
    e = edges
    if link_type is not None:
        e = e.filter(F.col("link_type") == link_type)
    if direction == "in":
        e = e.select(F.col("dst").alias("_from"), F.col("src").alias("_to"))
    else:
        e = e.select(F.col("src").alias("_from"), F.col("dst").alias("_to"))

    frontier = start_ids.select(F.col("node_id").alias("_from")).distinct()
    reached: DataFrame | None = None
    for hop in range(1, hops + 1):
        step = (
            e.join(F.broadcast(frontier), "_from")
            .select(F.col("_to").alias("node_id"))
            .distinct()
            .withColumn("hop", F.lit(hop))
        )
        reached = step if reached is None else reached.unionByName(step)
        frontier = step.select(F.col("node_id").alias("_from"))
    assert reached is not None
    return reached.groupBy("node_id").agg(F.min("hop").alias("hop"))


@dataclass
class QueryPlan:
    mode: str  # vector_only | graph_only | hybrid
    graph_link: str | None = None


GRAPH_KEYWORDS = {"related", "connected", "linked", "who", "knows", "network"}
VECTOR_KEYWORDS = {"similar", "like", "about", "semantic"}


def plan_query(question: str) -> QueryPlan:
    """Keyword-pattern planner (graph_search.rs:94-141): graph cues →
    GraphOnly, similarity cues → VectorOnly, both → Hybrid."""
    toks = set(question.lower().split())
    g = bool(toks & GRAPH_KEYWORDS)
    v = bool(toks & VECTOR_KEYWORDS)
    if g and v:
        return QueryPlan("hybrid", "LOCATED_IN")
    if g:
        return QueryPlan("graph_only", "LOCATED_IN")
    return QueryPlan("vector_only")


def nodes_from_entities(ents: DataFrame) -> DataFrame:
    """Aggregate per-doc entity mentions into MeshNodes carrying their
    frame_ids (logic_mesh.rs:27-80: MeshNode.frame_ids) — the bridge
    from NER output to the graph."""
    return ents.groupBy("entity", "kind").agg(
        F.sort_array(F.collect_set(F.col("doc_id"))).alias("frame_ids"),
        F.count("*").cast("long").alias("support"),
    )


def decorate_hits(hits: DataFrame, nodes: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Logic-Mesh entity enrichment of search hits (search/mod.rs:277-279,
    mesh.rs:181): explode node frame_ids, equi-join against the hit set.
    The node side is tiny after aggregation → broadcast; the hit set is
    k rows — this never touches the corpus."""
    exploded = nodes.select(
        "entity", "kind", F.explode("frame_ids").alias(id_col)
    )
    return hits.join(F.broadcast(exploded), id_col).select(
        id_col, "entity", "kind"
    )


def canonicalize_entities(ents: DataFrame) -> DataFrame:
    """Entity canonicalization into MeshNodes (logic_mesh.rs:27-80:
    MeshNode.canonical_name): surface forms differing only in case/
    whitespace merge under one canonical key; the display name is the
    most frequent surface form (ties: alphabetical), kind by majority
    vote with the same tie-break, frame_ids unioned, confidence = max.

    Input: (doc_id, entity, kind, confidence). Output:
    (canonical, display_name, kind, n_mentions, n_frames, confidence).
    """
    keyed = ents.withColumn("canonical", F.lower(F.trim(F.col("entity"))))
    by_form = keyed.groupBy("canonical", "entity", "kind").agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nf"),
        F.max("confidence").alias("c"),
    )
    w_name = Window.partitionBy("canonical").orderBy(
        F.col("n").desc(), F.col("entity").asc()
    )
    w_kind = Window.partitionBy("canonical").orderBy(
        F.col("n").desc(), F.col("kind").asc()
    )
    ranked = by_form.withColumn(
        "display_name", F.first("entity").over(w_name)
    ).withColumn("top_kind", F.first("kind").over(w_kind))
    return ranked.groupBy("canonical").agg(
        F.min("display_name").alias("display_name"),
        F.min("top_kind").alias("kind"),
        F.sum("n").cast("long").alias("n_mentions"),
        F.sum("nf").cast("long").alias("n_frames"),
        F.round(F.max("c"), 6).alias("confidence"),
    )


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    cluster id = smallest node id reachable from the node.

    The missing piece between pairwise near-dup detection (SimHash /
    MinHash / embedding pairs) and "keep one doc per duplicate group" —
    memvid only ever deduplicates exact hashes on insert
    (mutation.rs:3302-3316); transitive grouping is engine surface.

    Each iteration is one self-join + groupBy-min (associative and
    commutative, so partitioning never changes the result), converging
    in O(graph diameter) rounds — near-dup graphs are little cliques,
    so 1-2 rounds in practice. ``localCheckpoint`` truncates lineage
    per round (the iterative-algorithm pattern; plan growth is the real
    scale hazard). Output: (node, cluster). Nodes without edges are not
    emitted (singletons are their own trivial cluster).
    """
    # Checkpoint the undirected edge list ONCE: every iteration joins
    # against it, and without this the whole upstream edge-producing
    # pipeline (shingle explodes, LSH joins, ...) re-executes per round.
    und = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint()
    )
    # Convergence check rides the label aggregation itself: ``labels``
    # contributes exactly one row per node, so min("old") over each
    # group (min skips the NULLs the neighbour rows carry) IS that
    # node's previous cluster. The changed count is then a filter over
    # the checkpointed output — the per-round join of two O(nodes)
    # tables the old form paid for the same answer is gone.
    old_t = labels.schema["cluster"].dataType.simpleString()
    for _ in range(max_iter):
        nbr = und.join(
            labels, und["dst"] == labels["node"]
        ).select(F.col("src").alias("node"), F.col("cluster"))
        merged = (
            labels.withColumn("old", F.col("cluster"))
            .unionByName(nbr.withColumn("old", F.lit(None).cast(old_t)))
            .groupBy("node")
            .agg(
                F.min("cluster").alias("cluster"),
                F.min("old").alias("old"),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("cluster") != F.col("old")).count()
        labels = merged.select("node", "cluster")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def pagerank_scaled(
    edges: DataFrame,
    nodes: DataFrame,
    n_iter: int = 3,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-scaled PageRank over a link graph (the quality prior a
    web corpus derives from sources/htmltext.py's href extraction).

    All arithmetic is integer with floor division — contribution of
    u→v is rank_u div outdeg_u, and the damped update is
    base + (damping_pct * Σ contrib) div 100 — so the result is
    EXACTLY reproducible by a SQL oracle (no float summation-order
    drift). Dangling-node mass is dropped (the standard simplification;
    ranks remain a valid relative ordering).

    Scale shape (the connected_components pattern, :203): each
    iteration is one groupBy(dst) aggregation joined back to nodes —
    no windows, no driver data; localCheckpoint per round keeps the
    plan flat. edges: (src, dst); nodes: (node,).

    Returns (node, rank) with rank at the given integer scale.
    """
    out_deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = F.lit(15 * scale // 100)
    ranks = nodes.select(F.col("node"), F.lit(scale).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(out_deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (base + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100"))
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over the undirected view of an edge
    table — the third classic graph statistic next to PageRank
    (pagerank_scaled) and connected components (connected_components):
    triangles measure local cohesion (communities, link farms, mutual
    citation rings in a web corpus).

    Degree-oriented node-iterator: every undirected edge orients from
    its lower-rank to its higher-rank endpoint under the total order
    (degree, node id), and a triangle is found exactly once as
    o(x,y) ⋈ o(y,z) ⋈ o(x,z) — three equi-joins, no double counting,
    no windows. Each found triangle credits its three corners.

    Scale posture: the orientation is WHY this survives a web-scale
    link graph — a hub of degree d under naive id-orientation fans out
    up to d² wedge candidates from one reducer, while degree
    orientation caps every node's out-degree at O(√m), so total wedge
    work is O(m^1.5) regardless of skew (the standard bound; two extra
    narrow joins against the degree table buy it). Joins stay on node
    keys (co-partitioned, AQE on residual skew). Output: (node,
    degree, n_tri) for triangle members.
    """
    a = F.least(F.col(src), F.col(dst))
    b = F.greatest(F.col(src), F.col(dst))
    und = (
        edges.select(a.alias("a"), b.alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    oriented = _orient_by_degree(und, deg)
    wedge = (
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .join(
            oriented.select(F.col("u").alias("y"), F.col("v").alias("z")),
            "y",
        )
    )
    tri = wedge.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("z")),
        ["x", "z"],
    )
    corners = tri.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    counts = corners.groupBy("node").agg(F.count("*").alias("n_tri"))
    return counts.join(deg, "node").select("node", "degree", "n_tri")


def _orient_by_degree(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Orient canonical undirected edges (a, b) low→high under the
    total order (degree, node id): (u, v) with rank(u) < rank(v). A
    hub's edges thus point INTO it, capping out-degrees at O(√m) and
    with them the wedge fan-out."""
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("_da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("_db"))
    ranked = und.join(da, "a").join(db, "b")
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("a") < F.col("b"))
    )
    return ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )

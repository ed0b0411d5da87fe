"""Standalone A/B of the NSW shard-build kernel: current _build_shard
vs a bit-identical variant with numpy-bool visited + fewer allocations.
No Spark; pure kernel timing + exact adjacency equality."""
import sys, time, heapq

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
from memvid_spark.operators.hnsw import _build_shard  # noqa: E402


def _beam_search_v2(vecs, adj, entry, q, ef, visited):
    """Bit-identical to hnsw._beam_search, but `visited` is a reusable
    numpy bool array (caller zeroes it) instead of a Python set."""
    entries = [entry] if isinstance(entry, int) else list(entry)
    visited[:] = False
    for e in entries:
        visited[e] = True
    cand = []
    for e in entries:
        diff = vecs[e] - q
        cand.append((float(np.dot(diff, diff)), e))
    heapq.heapify(cand)
    best = [(-d, e) for d, e in cand]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        d, u = heapq.heappop(cand)
        if d > -best[0][0] and len(best) >= ef:
            break
        nbrs = [v for v in adj[u] if not visited[v]]
        if not nbrs:
            continue
        for v in nbrs:
            visited[v] = True
        diffs = vecs[nbrs] - q
        dvs = np.einsum("ij,ij->i", diffs, diffs)
        for v, dv in zip(nbrs, dvs):
            dv = float(dv)
            if len(best) < ef or dv < -best[0][0]:
                heapq.heappush(cand, (dv, v))
                heapq.heappush(best, (-dv, v))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted((-nd, v) for nd, v in best)


def build_v2(vecs, m, ef_construction):
    n = len(vecs)
    adj = [[] for _ in range(n)]
    visited = np.zeros(n, dtype=bool)
    for i in range(1, n):
        found = _beam_search_v2(vecs, adj, 0, vecs[i], ef_construction, visited)
        links = [v for _, v in found[:m]]
        adj[i] = links
        for v in links:
            adj[v].append(i)
            if len(adj[v]) > 2 * m:
                nbrs = adj[v]
                diffs = vecs[nbrs] - vecs[v]
                dd = np.einsum("ij,ij->i", diffs, diffs)
                dists = sorted((float(d), w) for d, w in zip(dd, nbrs))
                adj[v] = [w for _, w in dists[: 2 * m]]
    return adj


rng = np.random.default_rng(3)
for n, dim in ((4000, 8), (8000, 32)):
    vecs = rng.normal(size=(n, dim))
    t0 = time.perf_counter(); a1 = _build_shard(vecs, 16, 100); t1 = time.perf_counter()
    a2 = build_v2(vecs, 16, 100); t2 = time.perf_counter()
    print(f"n={n} dim={dim}: current {t1-t0:6.2f}s  v2 {t2-t1:6.2f}s "
          f"({(t1-t0)/(t2-t1):.2f}x)  identical={a1 == a2}")

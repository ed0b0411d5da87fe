"""Tune a deterministic fixture where the built NSW shard has a
directed-unreachable island that also avoids every evenly-spaced
beam seed — the reachability limit documented at hnsw._search_seeds.

Severing mechanism: the island inserts EARLY (right after one seed
position), links out to a few nearby-at-the-time main nodes, and the
hundreds of main nodes inserted AFTER it pile backlinks onto those
anchors until their lists overflow 2m and the far island backlinks
get pruned — island→main edges survive (outgoing lists under 2m),
main→island edges die: directed disconnection."""
import numpy as np
import sys

sys.path.insert(0, "/root/repo")
from memvid_spark.operators.hnsw import _build_shard, _search_seeds


def reach(adj, seeds):
    seen = set(seeds)
    stack = list(seeds)
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return seen


def try_fixture(n_main, n_island, m, dist, efc, seed=7):
    rng = np.random.default_rng(seed)
    dim = 8
    n = n_main + n_island
    stride = max(1, n // 16)
    start = stride + 1  # first gap after the second seed
    if start + n_island > 2 * stride:  # must not reach the next seed
        return None
    vecs = np.empty((n, dim))
    idx_island = list(range(start, start + n_island))
    isl = set(idx_island)
    idx_main = [i for i in range(n) if i not in isl]
    vecs[idx_main] = rng.normal(0, 1.0, (n_main, dim))
    vecs[idx_island] = rng.normal(dist, 0.05, (n_island, dim))
    adj = _build_shard(vecs, m, ef_construction=efc)
    seeds = _search_seeds(n)
    got = reach(adj, seeds)
    missed = [i for i in idx_island if i not in got]
    return n, start, len(missed), n_island, stride


for m in (4, 6, 8, 16):
    for n_main in (600, 1200):
        for n_island in (12, 20):
            for dist in (10.0,):
                for efc in (32, 100):
                    r = try_fixture(n_main, n_island, m, dist, efc)
                    if r:
                        n, start, miss, tot, stride = r
                        print(f"m={m} n_main={n_main} n_island={n_island} efc={efc}: "
                              f"n={n} stride={stride} island@{start} unreachable {miss}/{tot}")

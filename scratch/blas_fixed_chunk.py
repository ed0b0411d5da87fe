"""Fixed-size padded GEMM chunks: is a row's x @ C.T bitwise independent
of (a) total batch size, (b) its position within the batch, (c) BLAS
thread count?"""
import os
import sys

import numpy as np

R = 1024  # fixed chunk rows


def chunked_dot(X, Ct):
    M = len(X)
    out = np.empty((M, Ct.shape[1]), dtype=np.float64)
    for s in range(0, M, R):
        e = min(s + R, M)
        if e - s == R:
            out[s:e] = X[s:e] @ Ct
        else:
            pad = np.zeros((R, X.shape[1]), dtype=np.float64)
            pad[: e - s] = X[s:e]
            out[s:e] = (pad @ Ct)[: e - s]
    return out


def main():
    rng = np.random.default_rng(7)
    d = 8
    C = rng.normal(size=(4100, d))
    Ct = np.ascontiguousarray(C.T)
    X_full = rng.normal(size=(6000, d))
    row = X_full[123].copy()

    base = chunked_dot(X_full, Ct)[123]
    bad = 0
    for M in (124, 500, 1000, 1023, 1024, 1025, 2000, 5454, 5999):
        Xm = X_full[:M].copy()
        Xm[123] = row
        got = chunked_dot(Xm, Ct)[123]
        bad += int((got != base).sum())
    print("batch-size bit-diffs:", bad)

    # position independence: permute rows, track row 123
    perm_bad = 0
    for seed in range(5):
        p = np.random.default_rng(seed).permutation(6000)
        Xp = X_full[p]
        where = int(np.where(p == 123)[0][0])
        got = chunked_dot(Xp, Ct)[where]
        perm_bad += int((got != base).sum())
    print("position bit-diffs:", perm_bad)
    # print a value fingerprint for cross-process (thread-count) compare
    print("fingerprint:", base.tobytes()[:64].hex())


if __name__ == "__main__":
    if len(sys.argv) == 1:
        main()
        # re-run under different BLAS thread counts
        import subprocess
        for t in ("1", "4", "32"):
            env = dict(os.environ, OPENBLAS_NUM_THREADS=t,
                       OMP_NUM_THREADS=t)
            r = subprocess.run(
                [sys.executable, __file__, "sub"], env=env,
                capture_output=True, text=True)
            fp = [ln for ln in r.stdout.splitlines() if "fingerprint" in ln]
            print(f"threads={t}:", fp[0] if fp else r.stdout[-200:])
    else:
        main()

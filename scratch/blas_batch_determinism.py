"""Is a row's x @ C.T bitwise independent of the batch it rides in?
GEMM (BLAS) vs einsum (numpy loops), across different M."""
import numpy as np

rng = np.random.default_rng(7)
d = 8
C = rng.normal(size=(4100, d))
X_full = rng.normal(size=(6000, d))

row = X_full[123].copy()


def gemm_row(X):
    out = X @ C.T
    return out[123]


def einsum_row(X):
    out = np.einsum("ij,kj->ik", X, C)
    return out[123]


base_g = gemm_row(X_full)
base_e = einsum_row(X_full)
diffs_g = diffs_e = 0
for M in (124, 500, 1000, 2000, 5454, 5999):
    Xm = X_full[:M].copy()
    Xm[123] = row
    g = gemm_row(Xm)
    e = einsum_row(Xm)
    dg = int((g != base_g).sum())
    de = int((e != base_e).sum())
    diffs_g += dg
    diffs_e += de
    print(f"M={M:6d}  gemm row bit-diffs: {dg:4d}/4100   einsum: {de:4d}/4100")

# and is einsum == gemm numerically close but not equal?
print("einsum vs gemm equal:", int((base_e != base_g).sum()), "diffs")

# d2 shape used in the kernel
def d2_full(X, dot):
    return (X * X).sum(axis=1)[:, None] - 2.0 * dot + (C * C).sum(axis=1)[None, :]

# argmin flips across M for gemm?
fullmin = d2_full(X_full, X_full @ C.T).argmin(axis=1)
Xm = X_full[:3000]
m3 = d2_full(Xm, Xm @ C.T).argmin(axis=1)
print("argmin flips in first 3000 rows (gemm):", int((fullmin[:3000] != m3).sum()))
fe = d2_full(X_full, np.einsum("ij,kj->ik", X_full, C)).argmin(axis=1)
me = d2_full(Xm, np.einsum("ij,kj->ik", Xm, C)).argmin(axis=1)
print("argmin flips in first 3000 rows (einsum):", int((fe[:3000] != me).sum()))

import numpy.__config__ as cfg  # noqa: E402
try:
    print(np.show_config(mode="dicts")["Build Dependencies"]["blas"]["name"])
except Exception:
    pass

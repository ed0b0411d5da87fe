"""Same-session interleaved A/B: pq_encode / ivfpq encode kernels with
the old per-row list() conversion vs np.stack Arrow passthrough.
Run in a QUIET window. Uses the 100x embeddings blowup."""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark.operators import pq as pqm  # noqa: E402
from bench import _spark_cpu_s as cpu  # noqa: E402

PROBE = "/root/repo/scratch/probe100x"
spark = get_spark("ab-pq-encode")
emb = spark.read.parquet(f"{PROBE}/embeddings.parquet")
print("rows:", emb.count())

model = pqm.train_pq(emb, n_sub=8, k=32, seed=7)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_encode(model, emb, id_col="vec_id", vec_col="embedding"):
    cents = [np.asarray(c, dtype="float64") for c in model.centroids]
    n_sub, sub_dim = model.n_sub, model.sub_dim
    schema = f"{id_col} long, code array<int>"

    def run(batches):
        for pdf in batches:
            X = np.asarray([list(v) for v in pdf[vec_col]], dtype="float64")
            codes = np.empty((len(X), n_sub), dtype="int32")
            for s in range(n_sub):
                sub = X[:, s * sub_dim : (s + 1) * sub_dim]
                C = cents[s]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ C.T
                    + (C * C).sum(axis=1)[None, :]
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "code": list(map(list, codes))}
            )

    return emb.select(id_col, vec_col).mapInPandas(run, schema)


# warm
noop(old_encode(model, emb))
noop(pqm.encode(model, emb))

for rnd in range(3):
    w0, c0 = time.perf_counter(), cpu()
    noop(old_encode(model, emb))
    w1, c1 = time.perf_counter(), cpu()
    noop(pqm.encode(model, emb))
    w2, c2 = time.perf_counter(), cpu()
    print(
        f"round {rnd} old {w1-w0:6.2f}s/{c1-c0:7.1f}cpu"
        f"  new {w2-w1:6.2f}s/{c2-c1:7.1f}cpu",
        flush=True,
    )

a = old_encode(model, emb).orderBy("vec_id").collect()
b = pqm.encode(model, emb).orderBy("vec_id").collect()
print("codes equal:", a == b)
spark.stop()

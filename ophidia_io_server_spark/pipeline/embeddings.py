"""Embedding preprocessing: distributed PCA / whitening.

The standard pre-step before embedding dedup and ANN (decorrelating and
rescaling coordinates improves both LSH bucket balance and IVF cluster
shape).  Spark shape for d-dimensional embeddings at corpus scale:

1. ONE pass of ``mapInPandas`` computes per-batch partial moments
   ``(count, Σv, Σ v·vᵀ)`` with a single BLAS ``V.T @ V`` per Arrow batch —
   the corpus is never exploded to (row, i, j) triples (d² shuffle rows per
   vector) and never collected;
2. only the partials — one (1 + d + d²)-double row per batch — reach the
   driver, which assembles the d×d covariance and eigendecomposes it
   (d ≤ a few thousand: trivially driver-sized, like the IVF centroids);
3. the projection matrix broadcasts back and a vectorized Arrow UDF applies
   ``(v − mean) @ W`` (optionally scaled by 1/√λ for whitening) in one
   matmul per batch.

Eigenvector SIGN is pinned (largest-|component| coordinate made positive)
so results are deterministic across BLAS builds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _moments(df: DataFrame, vec_col: str, dim: int):
    """(n, sum, raw second moment matrix) via Arrow partial aggregation."""
    schema = "n long, s array<double>, ss array<double>"

    def part(batches):
        n, s, ss = 0, np.zeros(dim), np.zeros((dim, dim))
        for b in batches:
            if len(b) == 0:
                continue
            V = np.stack(b[vec_col].to_numpy())
            n += V.shape[0]
            s += V.sum(axis=0)
            ss += V.T @ V
        yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                            "ss": [ss.reshape(-1).tolist()]})

    rows = df.select(vec_col).mapInPandas(part, schema).collect()
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    return n, s, ss


def fit_pca(emb: DataFrame, vec_col: str = "embedding", k: int | None = None,
            center: bool = True):
    """Fit PCA on an embedding column.  Returns
    ``(mean: ndarray, components: ndarray (d×k), variances: ndarray (k,))``
    with components in DESCENDING variance order and pinned signs."""
    dim = len(emb.select(vec_col).first()[0])
    n, s, ss = _moments(emb, vec_col, dim)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mean = s / n if center else np.zeros(dim)
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2)  # symmetrize for stability
    order = np.argsort(evals)[::-1]
    evals, evecs = np.maximum(evals[order], 0.0), evecs[:, order]
    if k is not None:
        evals, evecs = evals[:k], evecs[:, :k]
    # deterministic sign: the largest-|x| coordinate of each component > 0
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    return mean, evecs, evals


def transform_pca(emb: DataFrame, mean, components, variances=None,
                  vec_col: str = "embedding", out_col: str = "proj",
                  whiten: bool = False, eps: float = 1e-12) -> DataFrame:
    """Project (and optionally whiten) every embedding: one broadcast of the
    (d×k) matrix, one BLAS matmul per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    W = np.asarray(components, dtype=np.float64)
    if whiten:
        if variances is None:
            raise ValueError("whiten=True needs the fitted variances")
        W = W / np.sqrt(np.asarray(variances, dtype=np.float64) + eps)
    bc = spark.sparkContext.broadcast((np.asarray(mean, dtype=np.float64), W))

    @pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        m, w = bc.value
        if len(vs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack(vs.to_numpy()) - m
        P = V @ w
        return pd.Series(list(P))

    return emb.withColumn(out_col, proj(F.col(vec_col)))


def pca_whiten(emb: DataFrame, vec_col: str = "embedding",
               k: int | None = None, whiten: bool = True,
               out_col: str = "proj") -> DataFrame:
    """fit + transform in one call (two passes over the data total)."""
    mean, comps, var = fit_pca(emb, vec_col, k)
    return transform_pca(emb, mean, comps, var, vec_col, out_col, whiten)

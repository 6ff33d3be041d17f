"""PCA over embedding columns (SURVEY §2.11 — embedding analytics).

Completes the ql9 covariance precursor into the actual transform a
curation pipeline uses (dimensionality reduction / whitening before
clustering or ANN). The split of work is the scale-correct one:

- moments (means + full covariance) come from ONE distributed
  aggregation pass — every `covar_pop`/`avg` combines map-side, so the
  shuffle carries moment tuples only, independent of corpus size;
- the eigendecomposition runs driver-side on the dim x dim matrix
  (numpy.linalg.eigh) — O(dim^3) on at most a few thousand doubles,
  never on row-count-sized data;
- projection broadcasts the (k x dim) component matrix back as plain
  Column expressions (zip_with/aggregate dot products) — JVM-side
  whole-stage codegen, no Python in the row path.

Certification tier: self-consistency (projected variances equal the
eigenvalues, projections uncorrelated) — eigenvectors are not
SQL-expressible, and their SIGN is arbitrary, so a cross-engine value
hash is not meaningful (tests/test_llm.py pins the invariants).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PCAModel:
    means: list[float]  # per-dim means (length dims)
    components: list[list[float]]  # k rows, each length dims
    eigenvalues: list[float]  # top-k, descending


def fit_pca(
    emb: DataFrame,
    k: int = 4,
    dims: int = 16,
    vec_col: str = "embedding",
) -> PCAModel:
    """Fit PCA on the leading `dims` coordinates of `vec_col` → top-k
    components. One aggregation action (means + upper-triangle
    covariances together); numpy eigh on the driver."""
    import numpy as np

    e = F.col(vec_col)
    aggs = [
        F.avg(F.element_at(e, i + 1).cast("double")).alias(f"m{i}")
        for i in range(dims)
    ] + [
        F.covar_pop(
            F.element_at(e, i + 1).cast("double"),
            F.element_at(e, j + 1).cast("double"),
        ).alias(f"c{i}_{j}")
        for i in range(dims)
        for j in range(i, dims)
    ]
    row = emb.agg(*aggs).collect()[0]
    means = [row[f"m{i}"] for i in range(dims)]
    cov = np.zeros((dims, dims))
    for i in range(dims):
        for j in range(i, dims):
            cov[i, j] = cov[j, i] = row[f"c{i}_{j}"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    return PCAModel(
        means=means,
        components=[vecs[:, o].tolist() for o in order],
        eigenvalues=[float(vals[o]) for o in order],
    )


def project(
    emb: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project rows onto the fitted components → (id, p0..p{k-1}).
    Pure Column expressions: center the leading dims against the
    broadcast means, dot with each component — all inside codegen."""
    dims = len(model.means)
    e = F.col(vec_col)
    centered = F.zip_with(
        F.slice(e.cast("array<double>"), 1, dims),
        F.array(*[F.lit(m) for m in model.means]),
        lambda x, m: x - m,
    )
    cols = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(c) for c in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"p{idx}")
        for idx, comp in enumerate(model.components)
    ]
    return emb.select(F.col(id_col), *cols)

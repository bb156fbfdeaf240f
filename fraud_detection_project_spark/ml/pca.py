"""Distributed PCA spectrum via partial-moment aggregation.

Reference scope: the reference's pandas pipeline ends at
standardization/one-hot (``src/preprocessing/transform_data.py``); PCA
is the canonical next step a feature pipeline at 100 TB needs for
embedding-column diagnostics (effective rank, variance concentration),
so it is provided as an engine-side operator with the same
fit-on-aggregates design as ``ml/prep.py``.

Scale design: the covariance matrix is accumulated GEMM-style — each
Arrow batch contributes ``(n, Σx, ΣxxT)`` partials in numpy (one
``d + d²`` float64 accumulator per partition, no per-row Python), and
only the |partitions| partial rows reach the driver, where the d×d
eigendecomposition is O(d³) scalar work. The raw vectors never
shuffle; nothing driver-side scales with row count. Same bounded-
collect contract as ``similarity.py`` centroids / ``indexing.py``
partition offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_spectrum(df: DataFrame, col: str = "embedding"):
    """Eigen-spectrum of the population covariance (ddof=0) of an
    ``array<float|double>`` column. Returns ``(n, trace, eigvals)``
    with ``eigvals`` descending float64.
    """
    import numpy as np
    import pandas as pd

    vecs = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("array<double>").alias("v")
    )

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(list(pdf["v"]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0)],
                    "ss": [(x.T @ x).ravel()],
                }
            )

    part = vecs.mapInPandas(
        partials, "n long, s array<double>, ss array<double>"
    ).toPandas()
    if part.empty:
        return 0, 0.0, None
    n = int(part["n"].sum())
    s = np.sum(np.stack(part["s"].to_numpy()), axis=0)
    ss = np.sum(np.stack(part["ss"].to_numpy()), axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    eigvals = np.linalg.eigvalsh(cov)[::-1]
    return n, float(np.trace(cov)), eigvals

"""Synthetic datasets and random code init.

`random_codes` mirrors the reference's `randinit`
(/root/reference/src/initializations.jl:2-8). `synthetic_dataset` provides a
Gaussian-mixture SIFT-like corpus so every pipeline (and CI) runs end-to-end
without downloading TEXMEX data.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


def random_codes(rng, n: int, m: int, h: int) -> np.ndarray:
    """Uniform random codes, [n, m] int32, 0-based."""
    if isinstance(rng, (int, np.integer)):
        rng = np.random.default_rng(rng)
    return rng.integers(0, h, size=(n, m), dtype=np.int32)


class SynthData(NamedTuple):
    train: np.ndarray  # [n_train, d]
    base: np.ndarray  # [n_base, d]
    query: np.ndarray  # [n_query, d]
    gt: np.ndarray  # [n_query] true NN in base (0-based)


def synthetic_dataset(
    seed: int = 0,
    *,
    d: int = 32,
    n_train: int = 2000,
    n_base: int = 10000,
    n_query: int = 100,
    n_clusters: int = 128,
    noise: float = 0.6,
) -> SynthData:
    """Clustered Gaussian-mixture data with exact ground truth."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)

    def draw(n):
        which = rng.integers(0, n_clusters, size=n)
        return (
            centers[which] + noise * rng.normal(size=(n, d))
        ).astype(np.float32)

    train, base, query = draw(n_train), draw(n_base), draw(n_query)
    # Exact NN ground truth, query-chunked GEMM (one matvec per query is
    # BLAS-2 / memory-bound — ~40x slower at 1M x 10k scale).
    gt = np.empty(n_query, np.int64)
    b2 = (base * base).sum(1)
    qc = 256
    for s in range(0, n_query, qc):
        d2 = b2[None, :] - 2.0 * query[s : s + qc] @ base.T
        gt[s : s + qc] = np.argmin(d2, axis=1)
    return SynthData(train, base, query, gt)

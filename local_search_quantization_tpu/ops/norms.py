"""Norm quantization for the additive-code query path.

LSQ's scanner needs ||reconstruction||^2 per database vector; these are
k-means-quantized into an h-entry norm codebook so each vector spends one
extra byte (the reference's "m=7 codebooks + 1 norm byte = 64 bits" layout,
/root/reference/src/lsq/LSQ.jl:69-85, src/utils.jl:6-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from local_search_quantization_tpu.ops.costs import reconstruct
from local_search_quantization_tpu.ops.kmeans import kmeans

Array = jax.Array


def reconstruction_sqnorms(B: Array, C: Array) -> Array:
    """||sum_i C[i, B[:, i]]||^2 per vector: [n] float32."""
    CB = reconstruct(B, C)
    return jnp.sum(CB * CB, axis=-1)


def train_norm_codebook(key: Array, B: Array, C: Array, h: int):
    """1-D k-means over reconstruction norms. Returns (cbnorms [h], codes [n]).

    (Reference: kmeans(dbnorms, h) at LSQ.jl:80.)
    """
    sqnorms = reconstruction_sqnorms(B, C)
    res = kmeans(key, sqnorms[:, None], h)
    return res.centers[:, 0], res.assignments


@jax.jit
def quantize_norms(B: Array, C: Array, cbnorms: Array) -> Array:
    """Assign each vector's reconstruction norm to its nearest codebook entry.

    Returns [n] int32 norm codes. (Reference: quantize_norms, utils.jl:6-31.)
    """
    sqnorms = reconstruction_sqnorms(B, C)  # [n]
    d2 = (sqnorms[:, None] - cbnorms[None, :]) ** 2
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)

#!/usr/bin/env python
"""Isolate fused-ICM-kernel per-visit costs with surgical kernel variants.

Variants (numbers are NOT semantically valid encoders; timing only):
  full    — the production kernel body
  nowrite — drop the one-hot state update (isolates the dynamic-lane write)
  noargmin— write a constant code (isolates argmin)
  mmonly  — matmul + sum only (lower bound)
"""

import functools
import sys
import time

import numpy as np

try:  # repo-root sys.path shim for plain-file runs; see _bootstrap.py
    import _bootstrap  # noqa: F401
except ImportError:  # python -m benchmarks.X: root already on path
    pass


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from local_search_quantization_tpu.ops.icm_pallas import binaries_to_j_stacked
    from local_search_quantization_tpu.ops.luts import get_binaries, get_unaries

    n, d, m, h = 1 << 17, 128, 7, 256
    tile, icmiter = 768, 4
    nvisit = icmiter * m
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 256, size=(n, d)).astype(np.float32))
    C = jnp.asarray((rng.normal(size=(m, h, d)) * 36.0).astype(np.float32))
    B = jnp.asarray(rng.integers(0, h, size=(n, m), dtype=np.int32))
    pad = (-n) % tile
    npad = n + pad

    unaries = jax.jit(get_unaries)(X, C)
    if pad:
        unaries = jnp.concatenate([unaries, jnp.zeros((pad, m, h))])
        B = jnp.concatenate([B, jnp.zeros((pad, m), jnp.int32)])
    bint = binaries_to_j_stacked(get_binaries(C).astype(jnp.bfloat16))
    visits = jnp.tile(jnp.arange(m, dtype=jnp.int32), icmiter)

    def make(variant):
        def kernel(order_ref, u_ref, bint_ref, b_ref, out_ref, oh_ref):
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1)
            for k in range(m):
                oh_ref[:, k * h : (k + 1) * h] = (
                    b_ref[:, k : k + 1] == col_ids
                ).astype(jnp.bfloat16)

            def visit(s, carry):
                j = order_ref[s]
                w = bint_ref[pl.ds(j, 1)].reshape(m * h, h)
                acc = u_ref[:, pl.ds(j, 1), :].reshape(tile, h)
                cond = jax.lax.dot_general(
                    oh_ref[:, :], w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                scores = acc + cond
                if variant == "mmonly":
                    return carry + jnp.sum(scores[:, :1])
                newcode = (
                    jnp.argmin(scores, axis=-1)
                    if variant != "noargmin"
                    else jnp.full((tile,), 3, jnp.int32)
                )
                if variant == "nowrite":
                    return carry + newcode[0].astype(jnp.float32)
                if variant == "predwrite":
                    newoh = (newcode[:, None] == col_ids).astype(jnp.bfloat16)
                    for jj in range(m):
                        @pl.when(j == jj)
                        def _():
                            oh_ref[:, jj * h : (jj + 1) * h] = newoh
                    return carry
                off = pl.multiple_of(j * h, h)
                oh_ref[:, pl.ds(off, h)] = (
                    newcode[:, None] == col_ids
                ).astype(jnp.bfloat16)
                return carry

            acc = jax.lax.fori_loop(0, nvisit, visit, jnp.float32(0.0))
            out_ref[:] = jnp.stack(
                [
                    jnp.argmax(
                        oh_ref[:, k * h : (k + 1) * h].astype(jnp.float32), -1
                    ).astype(jnp.int32)
                    for k in range(m)
                ],
                axis=1,
            ) + acc.astype(jnp.int32) * 0

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(npad // tile,),
            in_specs=[
                pl.BlockSpec((tile, m, h), lambda i, *_: (i, 0, 0),
                             pipeline_mode=pl.Buffered(buffer_count=1)),
                pl.BlockSpec((m, m * h, h), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
            scratch_shapes=[pltpu.VMEM((tile, m * h), jnp.bfloat16)],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((npad, m), jnp.int32),
        )

        @jax.jit
        def run(visits, unaries, bint, B, reps):
            def body(b, _):
                return call(visits, unaries, bint, b), None
            out, _ = jax.lax.scan(body, B, None, length=16)
            return out

        return run

    for variant in sys.argv[1:] or ["full", "nowrite", "noargmin", "mmonly"]:
        run = make(variant)
        out = run(visits, unaries, bint, B, None)
        _ = np.asarray(out[:1, :1])
        best = 1e9
        for t in range(2):
            t0 = time.perf_counter()
            out = run(visits, unaries + t, bint, B, None)
            _ = np.asarray(out[:1, :1])
            best = min(best, time.perf_counter() - t0)
        per_round = best / 16
        print(f"{variant:9s}: {per_round*1e3:7.1f} ms/round  "
              f"({per_round / (nvisit * (npad // tile)) * 1e6:5.2f} us/visit)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Whole-ILS kernel throughput across (m, h) shapes on the real TPU.

VERDICT r1 item 9: the reference's CUDA kernel hard-codes h=256 / d=128
(cudautils.cu:58,93-95); ours must hold throughput (and semantics) at the
m=8 PQ-width config and at non-256 h. Uses bench.py's marginal-cost
methodology (two round counts, min-of-trials, one tiny forced fetch) because
jax.block_until_ready is a no-op on the tunneled backend.

Run from the repo root: python -m benchmarks.bench_ils_shapes [m,h ...]
e.g. python -m benchmarks.bench_ils_shapes 7,256 8,256 7,512
"""

import sys
import time

import numpy as np

try:  # repo-root sys.path shim for plain-file runs; see _bootstrap.py
    import _bootstrap  # noqa: F401
except ImportError:  # python -m benchmarks.X: root already on path
    pass

K_LO, K_HI = 2, 18
TRIALS = 2


def bench_config(m: int, h: int, *, n: int = 1 << 17, d: int = 128,
                 icmiter: int = 4, npert: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    from local_search_quantization_tpu.ops.icm import ils_encode

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 256, size=(n, d)).astype(np.float32))
    C = jnp.asarray((rng.normal(size=(m, h, d)) * 36.0).astype(np.float32))
    B = jnp.asarray(rng.integers(0, h, size=(n, m), dtype=np.int32))

    def run(rounds: int) -> float:
        # X and C are ARGUMENTS, not closure constants: closed-over arrays
        # are inlined into the serialized HLO, and at d=960 the 503 MB X
        # constant overflows the remote-compile HTTP hop (observed live:
        # "HTTP 413: length limit exceeded").
        fn = jax.jit(
            lambda key, X, B, C: ils_encode(
                key, X, B, C, ilsiter=rounds, icmiter=icmiter, npert=npert,
                randord=True, condition_mode="kernel",
            )
        )
        res = fn(jax.random.PRNGKey(0), X, B, C)
        _ = np.asarray(res.cost[:1])  # compile + force
        best = float("inf")
        for t in range(TRIALS):
            t0 = time.perf_counter()
            res = fn(jax.random.PRNGKey(t + 1), X, B, C)
            _ = np.asarray(res.cost[:1])
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(K_LO)
    t_hi = run(K_HI)
    return n * (K_HI - K_LO) / max(t_hi - t_lo, 1e-9)


def main():
    # Each arg is "m,h" or "m,h,d" (d defaults to 128; d=960 = the GIST1M
    # shape, the reference's second dataset, read_datasets.jl:22-26).
    configs = [
        tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]
    ] or [(7, 256), (8, 256), (7, 512)]
    from bench import baseline_vecs_per_sec  # width-consistent denominator

    for cfg in configs:
        m, h = cfg[0], cfg[1]
        d = cfg[2] if len(cfg) > 2 else 128
        try:
            v = bench_config(m, h, d=d)
            base = baseline_vecs_per_sec(m)
            print(f"m={m} h={h} d={d}: {v:12,.0f} vec/s per ILS round "
                  f"({v / base:.2f}x the {base / 1e3:.0f}k CUDA estimate "
                  f"at this width)", flush=True)
        except Exception as e:  # VMEM overflow etc. — report, keep sweeping
            print(f"m={m} h={h} d={d}: FAILED — {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

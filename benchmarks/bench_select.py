#!/usr/bin/env python
"""Device-resident marginal QPS of the fused scan+select kernel.

Compares the cold (no-threshold) kernel against the warm-started wrapper
(scan_topk_warm) at SIFT1M scale, timing with one tiny forced fetch so the
number reflects device throughput, not the ~0.5-1 s tunnel fetch of the
full [nq, k] result (see CLAUDE.md's timing notes). The warm wrapper's
exactness-certificate sync is PART of its measured cost.

Run from the repo root:
    python -m benchmarks.bench_select [k] [nq] [tb ...]
"""

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

    from local_search_quantization_tpu.ops import adc
    from local_search_quantization_tpu.ops.select_pallas import (
        fused_scan_topk,
        scan_topk_warm,
    )

    import os

    n, d, m, h = 1_000_000, 128, 7, 256
    # Code-width override for the 128-bit geometries (m*h=3840/4096),
    # e.g. LSQ_TPU_SELECT_SHAPE=15,256 — the kernel consumes [m*h]-shaped
    # LUTs + [m, n] codes, so d stays fixed.
    shape_env = os.environ.get("LSQ_TPU_SELECT_SHAPE", "")
    if shape_env:
        m, h = (int(x) for x in shape_env.split(","))
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    tbs = [int(x) for x in sys.argv[3:]] or [1024, 2048]
    rng = np.random.default_rng(0)
    C = (rng.normal(size=(m, h, d)) * 36.0).astype(np.float32)
    Bt = jnp.asarray(np.ascontiguousarray(
        rng.integers(0, h, size=(n, m)).astype(np.int32).T))
    Q = rng.integers(0, 256, size=(nq, d)).astype(np.float32)
    dbn = jnp.asarray((rng.normal(size=n) ** 2 * 1e5).astype(np.float32))
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    luts2 = adc.lsq_query_luts(jnp.asarray(Q + 1.0), jnp.asarray(C))

    def timeit(fn):
        d_, _ = fn(luts)  # compile + warm
        _ = np.asarray(d_[:1, :1])
        best = float("inf")
        for lt in (luts2, luts):
            t0 = time.perf_counter()
            d_, _ = fn(lt)
            _ = np.asarray(d_[:1, :1])  # force the chain, tiny fetch
            best = min(best, time.perf_counter() - t0)
        return nq / best

    variants = os.environ.get("LSQ_TPU_SELECT_VARIANTS", "sorted").split(",")
    # Explicit query-block sweep (e.g. LSQ_TPU_SELECT_NQTS=128,256,512 for
    # the large-k geometry, where per-insert buffer passes are O(cap) and
    # small blocks bound them); default keeps the historical pair.
    env_nqts = os.environ.get("LSQ_TPU_SELECT_NQTS", "")
    if env_nqts:
        # 0 = the auto block size (_pick_nqt), e.g. LSQ_TPU_SELECT_NQTS=0
        # to probe only the default geometry at large nq.
        nqts = [int(x) or None for x in env_nqts.split(",")]
    else:
        nqts = [None] if nq <= 1024 else [None, nq]  # None = _pick_nqt
    warm_only = os.environ.get("LSQ_TPU_SELECT_WARM_ONLY", "") == "1"
    # precision="bf16" = the hi-only serving mode (LUTs rounded to bf16,
    # lo matmul dropped — half the scan MXU work; see fused_scan_topk).
    prec = os.environ.get("LSQ_TPU_SELECT_PRECISION", "f32")
    for tb in tbs:
        for nqt in nqts:
            for v in variants:
                # variant="key" has no cold path: it REQUIRES a warm
                # threshold (and returns an extra certificate flag), so
                # only its warm timing is meaningful.
                cold = 0.0 if (warm_only or v == "key") else timeit(
                    lambda lt: fused_scan_topk(
                        lt, Bt, dbn, k=k, tb=tb, nqt=nqt, variant=v,
                        precision=prec))
                warm = timeit(lambda lt: scan_topk_warm(
                    lt, Bt, dbn, k=k, tb=tb, nqt=nqt, variant=v,
                    precision=prec))
                print(f"k={k} nq={nq} tb={tb} nqt={nqt or 'auto'} {v} "
                      f"{prec}: "
                      f"cold {cold:8,.0f} qps | warm {warm:8,.0f} qps",
                      flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: ILS/ICM encoding throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: vectors/second through one full ILS round (perturbation + 4 ICM
sweeps over m=7 codebooks at h=256, d=128 + per-vector accept-if-better) at
the reference's SIFT1M base-encoding config (demos/demo_lsq.jl:34-38 with
icmiter=4, npert=4, randord), using the fused Pallas ICM kernel. This is the
computation both training and base encoding spend their time in, and the one
the reference offloads to CUDA (encode_icm_cuda.jl / cudautils.cu).

Timing methodology: the backend may execute lazily with ~35 ms RPC per
dispatch+fetch (axon tunnel), so we time one jitted call doing K_HI ILS
rounds and one doing K_LO rounds — each followed by a tiny host fetch that
forces the chain — and report the marginal per-round rate
n * (K_HI - K_LO) / (T_HI - T_LO). This also amortizes the unary/pairwise
LUT builds exactly as real base encoding does (16+ rounds per LUT build).

vs_baseline: ratio to the reference GPU encoder's estimated throughput on the
hardware it shipped for (NVIDIA Titan X) — see BASELINE.md (~333k vec/s per
ILS round; the repo publishes no numbers). Target from BASELINE.json: >= 10x.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

def baseline_vecs_per_sec(m: int = 7, icmiter: int = 4) -> float:
    """Reference CUDA encoder estimate at an (m, icmiter) shape.

    BASELINE.md pins 333k vec/s per ILS round at the demo config (m=7,
    icmiter=4) from the kernel's memory traffic on the hardware the
    reference shipped for (Titan X): icmiter*m*(m-1) conditioning passes
    per vector dominate (encode_icm_cuda.jl:165-207, cudautils.cu:236-339),
    so the estimate scales as 1/(icmiter*m*(m-1)). At the PQ width m=8 the
    per-vector work is 56/42 = 1.33x larger -> ~250k vec/s. This function
    is the single machine-readable denominator for every ILS throughput
    ratio (bench.py headline and benchmarks/bench_ils_shapes.py alike).
    """
    passes = icmiter * m * (m - 1)
    return 333_000.0 * (4 * 7 * 6) / passes


BASELINE_VECS_PER_SEC = baseline_vecs_per_sec(7, 4)  # headline config
K_LO, K_HI = 2, 34  # wide span + min-of-trials to beat ~0.1-0.3 s RPC jitter
TRIALS = 3


def main():
    import jax
    import jax.numpy as jnp

    from local_search_quantization_tpu.ops.icm import ils_encode

    n, d, m, h = 1 << 17, 128, 7, 256
    icmiter, npert = 4, 4
    rng = np.random.default_rng(0)
    # SIFT-like scale (uint8-valued features) so LUT magnitudes are realistic.
    X = jnp.asarray(rng.integers(0, 256, size=(n, d)).astype(np.float32))
    C = jnp.asarray((rng.normal(size=(m, h, d)) * 36.0).astype(np.float32))
    B = jnp.asarray(rng.integers(0, h, size=(n, m), dtype=np.int32))
    key = jax.random.PRNGKey(0)
    import os

    default_mode = "kernel" if jax.default_backend() == "tpu" else "gather"
    mode = os.environ.get("LSQ_TPU_BENCH_MODE", default_mode)

    def run(ils_rounds: int) -> float:
        fn = jax.jit(
            lambda key, B: ils_encode(
                key, X, B, C,
                ilsiter=ils_rounds, icmiter=icmiter, npert=npert,
                randord=True, condition_mode=mode,
            )
        )
        res = fn(key, B)
        _ = np.asarray(res.cost[:1])  # warm-up + compile, forced
        best = float("inf")
        for t in range(TRIALS):
            t0 = time.perf_counter()
            res = fn(jax.random.PRNGKey(t + 1), B)
            _ = np.asarray(res.cost[:1])  # force the whole chain
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = run(K_LO)
    t_hi = run(K_HI)
    vecs_per_sec = n * (K_HI - K_LO) / max(t_hi - t_lo, 1e-9)
    # MFU accounting (kernel mode): per vector per ILS round, icmiter*m
    # visit matmuls at 2*(m*h)*h FLOP each + the upper-triangle hi/lo cost
    # matmuls at 2*m*(m-1)*h^2 total, against the v5e's 197 TFLOP/s peak.
    mh = m * h
    flops_per_vec = icmiter * m * 2 * mh * h + 2 * m * (m - 1) * h * h
    mfu = vecs_per_sec * flops_per_vec / 197e12
    print(
        f"[bench] MFU ~{100 * mfu:.0f}% of v5e bf16 peak "
        f"({vecs_per_sec * flops_per_vec / 1e12:.0f} TFLOP/s; "
        f"{flops_per_vec / 1e6:.1f} MFLOP/vec/round)",
        file=sys.stderr,
    )
    print(
        f"[bench] {n} vecs, marginal over {K_HI - K_LO} ILS rounds "
        f"(icm={icmiter}, m={m}, h={h}, d={d}, mode={mode}): "
        f"T{K_LO}={t_lo:.3f}s T{K_HI}={t_hi:.3f}s on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "ils_encode_throughput",
                "value": round(vecs_per_sec, 1),
                "unit": "vectors/sec/chip (1 ILS round: 4 ICM sweeps, m=7, h=256, d=128)",
                "vs_baseline": round(vecs_per_sec / BASELINE_VECS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

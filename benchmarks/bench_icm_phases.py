#!/usr/bin/env python
"""Phase-level timing of the ILS encode pipeline on the current backend.

Methodology for remote/async backends (axon): `block_until_ready` does not
force execution and every dispatch+fetch costs ~35 ms RPC, so each phase is
timed as an on-device `lax.fori_loop` of K dependent iterations inside ONE
dispatch, fetched once; per-iteration time = (T(K) - T(1)) / (K - 1).
"""

import time

import numpy as np

try:  # repo-root sys.path shim for plain-file runs; see _bootstrap.py
    import _bootstrap  # noqa: F401
except ImportError:  # python -m benchmarks.X: root already on path
    pass


def main():
    import jax
    import jax.numpy as jnp

    from local_search_quantization_tpu.ops import costs, icm, luts
    from local_search_quantization_tpu.ops.icm_pallas import fused_icm_sweeps

    n, d, m, h = 1 << 17, 128, 7, 256
    icmiter = 4
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 256, size=(n, d)).astype(np.float32))
    C = jnp.asarray((rng.normal(size=(m, h, d)) * 36.0).astype(np.float32))
    B = jnp.asarray(rng.integers(0, h, size=(n, m), dtype=np.int32))

    unaries = jax.jit(luts.get_unaries)(X, C)
    binaries = jax.jit(luts.get_binaries)(C)
    bin16 = binaries.astype(jnp.bfloat16)
    order = jnp.arange(m, dtype=jnp.int32)

    def timed_loop(name, make_body, K=9):
        """make_body() -> (body_fn, init_carry); body must chain its carry."""

        def run(k):
            body, init = make_body()
            fn = jax.jit(
                lambda c: jax.lax.fori_loop(0, k, body, c), static_argnums=()
            )
            out = fn(init)
            # One cheap fetch forces the chain.
            leaf = jax.tree_util.tree_leaves(out)[0]
            t0 = time.perf_counter()
            out = fn(init)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf).reshape(-1)[:1]
            return time.perf_counter() - t0

        t1, tk = run(1), run(K)
        print(f"{name:22s}: {(tk - t1) / (K - 1) * 1e3:8.2f} ms/iter "
              f"(T1={t1*1e3:.0f}ms TK={tk*1e3:.0f}ms)")

    timed_loop(
        "unaries einsum",
        lambda: (
            lambda i, x: x + 1e-12 * luts.get_unaries(x, C)[:, 0, :d],
            X,
        ),
    )
    timed_loop(
        "veccost",
        lambda: (
            lambda i, x: x + 1e-12 * costs.veccost(x, B, C)[:, None],
            X,
        ),
    )
    timed_loop(
        "perturb",
        lambda: (
            lambda i, b: icm.perturb_codes(jax.random.PRNGKey(0), b, 4, h),
            B,
        ),
    )
    timed_loop(
        "fused kernel (4 icm)",
        lambda: (
            lambda i, b: fused_icm_sweeps(b, unaries, bin16, order, icmiter=icmiter),
            B,
        ),
        K=5,
    )
    timed_loop(
        "gather sweeps (4)",
        lambda: (
            lambda i, b: icm.icm_sweeps(
                b, unaries, binaries, order, icmiter, condition_mode="gather"
            ),
            B,
        ),
        K=5,
    )
    timed_loop(
        "matmul sweeps (4)",
        lambda: (
            lambda i, b: icm.icm_sweeps(
                b, unaries, binaries, order, icmiter, condition_mode="matmul"
            ),
            B,
        ),
        K=5,
    )


if __name__ == "__main__":
    main()

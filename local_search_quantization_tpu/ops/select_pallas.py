"""Fused Pallas TPU kernel: ADC scan + exact streaming top-k selection.

TPU replacement for the selection half of the reference's C++ scanners
(/root/reference/src/linscan/cpp/linscan_aqd.cpp:82-91 — scan-N then
`std::partial_sort`): XLA's `lax.top_k` costs ~20-40 ms per 256 queries at
k=1000 regardless of candidate count (measured on a v5e), so any XLA-level
design pays that at least twice per query chunk. This kernel removes XLA
selection entirely:

- distances: one-hot(codes) x LUT matmuls on the MXU, with the per-query
  LUT split hi/lo into two bf16 operands (one-hot entries are exact in
  bf16, so two matmuls recover ~16 mantissa bits of each LUT entry —
  f32-grade ADC distances);
- selection: each query keeps an insertion-sorted top-k buffer in VMEM.
  Per code tile, elements are extracted only while they beat the current
  k-th best (expected total inserts per query = k + k*ln(n/k) ~ 8k at
  k=1000, n=1M — almost every tile is a pure threshold reject);
- the sorted buffer doubles as the kernel output: results come back
  already sorted ascending, ids exact.

Grid is (query blocks, code tiles); the base codes stream through VMEM with
automatic double buffering while the query block's LUTs and buffer stay
resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _select_kernel(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref,
                   out_d_ref, out_i_ref, dist_ref, *,
                   m: int, h: int, k: int, cap: int, tb: int, nqt: int):
    t = pl.program_id(1)
    ntiles = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        out_d_ref[:] = jnp.full((nqt, cap), jnp.inf, jnp.float32)
        out_i_ref[:] = jnp.full((nqt, cap), -1, jnp.int32)

    # --- Distances for this tile: 2 bf16 matmuls (hi/lo split LUTs). ---
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, h), dimension=1)
    oh = jnp.concatenate(
        [
            (codes_ref[:, i : i + 1] == col_ids).astype(jnp.bfloat16)
            for i in range(m)
        ],
        axis=1,
    )  # [tb, m*h]
    dhi = jax.lax.dot_general(
        lut_hi_ref[:, :], oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dlo = jax.lax.dot_general(
        lut_lo_ref[:, :], oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist_ref[:] = dhi + dlo + extra_ref[0, :][None, :]

    # --- Extract every element beating the current per-query k-th best. ---
    lane_cap = jax.lax.broadcasted_iota(jnp.int32, (nqt, cap), dimension=1)
    lane_tb = jax.lax.broadcasted_iota(jnp.int32, (nqt, tb), dimension=1)

    def kth():
        return jax.lax.slice(out_d_ref[:, :], (0, k - 1), (nqt, k))  # [nqt,1]

    def pending():
        return jnp.sum((dist_ref[:, :] < kth()).astype(jnp.float32))

    def body(carry):
        dist = dist_ref[:, :]
        vmin = jnp.min(dist, axis=1)  # [nqt]
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
        act = (vmin[:, None] < kth())  # [nqt, 1]

        # Kill the extracted element (unconditionally: inactive queries
        # can't re-activate within this tile since their k-th only
        # tightens on insert).
        dist_ref[:, :] = jnp.where(lane_tb == idx[:, None], jnp.inf, dist)

        # Predicated sorted insert at pos = #(buffer < v).
        buf_d, buf_i = out_d_ref[:, :], out_i_ref[:, :]
        pos = jnp.sum((buf_d < vmin[:, None]).astype(jnp.int32), axis=1)
        below = lane_cap < pos[:, None]
        at = lane_cap == pos[:, None]
        new_d = jnp.where(
            below, buf_d,
            jnp.where(at, vmin[:, None], pltpu.roll(buf_d, 1, axis=1)),
        )
        gid = t * tb + idx
        new_i = jnp.where(
            below, buf_i,
            jnp.where(at, gid[:, None], pltpu.roll(buf_i, 1, axis=1)),
        )
        out_d_ref[:, :] = jnp.where(act, new_d, buf_d)
        out_i_ref[:, :] = jnp.where(act, new_i, buf_i)
        return pending()

    jax.lax.while_loop(lambda c: c > 0.0, body, pending())


def _pick_nqt(nq: int) -> int:
    """Query-block rows: one big block minimizes extraction iterations
    (sum over tiles of max-over-queries hit counts — measured 3,828 qps at
    nqt=1024 vs 891 at nqt=256, k=1000, n=1M on a v5e); small query sets
    get the next power of two to avoid 10x pad waste."""
    nqt = 128
    while nqt < 1024 and nqt < nq:
        nqt *= 2
    return nqt


@functools.partial(
    jax.jit, static_argnames=("k", "tb", "nqt", "interpret")
)
def fused_scan_topk(
    luts: Array,
    B: Array,
    extra: Array,
    *,
    k: int,
    tb: int = 1024,
    nqt: int | None = None,
    interpret: bool = False,
):
    """Exact kNN over the full base in ONE kernel launch per query set.

    Args:
      luts: [nq, m, h] float32 per-query ADC tables.
      B: [n, m] int32 codes; n is padded here to a tile multiple.
      extra: [n] float32 additive term (db norms; zeros for PQ). Padded
        rows get +inf so they can never be selected.
      k: neighbors to return (sorted ascending).

    Returns (dists [nq, k] f32, ids [nq, k] int32).
    """
    nq, m, h = luts.shape
    n = B.shape[0]
    if nqt is None:
        nqt = _pick_nqt(nq)
    cap = max(128, -(-k // 128) * 128)

    pad_n = (-n) % tb
    if pad_n:
        B = jnp.concatenate([B, jnp.zeros((pad_n, m), B.dtype)])
        extra = jnp.concatenate(
            [extra, jnp.full((pad_n,), jnp.inf, extra.dtype)]
        )
    pad_q = (-nq) % nqt
    if pad_q:
        luts = jnp.concatenate(
            [luts, jnp.broadcast_to(luts[-1:], (pad_q, m, h))]
        )
    nqp = nq + pad_q
    npad = n + pad_n

    flat = luts.reshape(nqp, m * h)
    hi = flat.astype(jnp.bfloat16)
    lo = (flat - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    grid = (nqp // nqt, npad // tb)
    kernel = functools.partial(
        _select_kernel, m=m, h=h, k=k, cap=cap, tb=tb, nqt=nqt
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nqt, m * h), lambda q, t: (q, 0)),
            pl.BlockSpec((nqt, m * h), lambda q, t: (q, 0)),
            pl.BlockSpec((tb, m), lambda q, t: (t, 0)),
            pl.BlockSpec((1, tb), lambda q, t: (0, t)),
        ],
        out_specs=[
            pl.BlockSpec((nqt, cap), lambda q, t: (q, 0)),
            pl.BlockSpec((nqt, cap), lambda q, t: (q, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nqp, cap), jnp.float32),
            jax.ShapeDtypeStruct((nqp, cap), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nqt, tb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(hi, lo, B, extra[None, :])
    return out_d[:nq, :k], out_i[:nq, :k]

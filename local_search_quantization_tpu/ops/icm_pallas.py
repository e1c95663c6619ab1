"""Fused Pallas TPU kernel for the ICM sweep loop.

This is the TPU replacement for the reference's CUDA `condition_icm3` kernel
(/root/reference/src/encodings/cuda/cudautils.cu:236-339) — but where the CUDA
kernel is launched once per (ICM iteration x codebook) with a host round-trip
to concatenate pairwise LUTs (encode_icm_cuda.jl:165-183), this kernel runs
ALL icmiter*m conditional-argmin visits in one launch:

- the [m, m, h, h] pairwise LUT tensor lives in VMEM in bf16 for the whole
  kernel (5.7 MB at m=7, h=256 — the CUDA version re-uploads slices from host
  every visit);
- each grid step owns a tile of vectors; its unaries ([tile, m, h] fp32) are
  read from HBM exactly once per ILS round;
- conditioning is a one-hot (bf16, exact) x LUT matmul on the MXU; the
  conditional argmin over h runs on the VPU;
- codes stay in registers/VMEM across all visits; HBM sees only the final
  codes.

The visit order (icmiter repeats of a possibly shuffled codebook permutation)
arrives via scalar prefetch, so the random ICM order of the reference
(`randperm(m)` per ILS round) is preserved without recompilation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _icm_kernel(order_ref, u_ref, bin_ref, b_ref, out_ref, oh_ref, *, m: int,
                h: int, nvisit: int):
    tile = b_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, h), dimension=1)

    # Codes are carried as per-codebook one-hot matrices in VMEM scratch —
    # they double as the left matmul operand, and updating codebook j is a
    # dynamic write on the *leading* axis (Mosaic cannot dynamically write a
    # lane column of an int [tile, m] block).
    for k in range(m):
        oh_ref[k] = (b_ref[:, k : k + 1] == col_ids).astype(jnp.bfloat16)

    def visit(s, carry):
        j = order_ref[s]
        acc = u_ref[:, pl.ds(j, 1), :].reshape(tile, h)  # fp32 [tile, h]
        for k in range(m):  # static unroll: m is small (7-8)
            lut = bin_ref[k, pl.ds(j, 1)].reshape(h, h)  # bf16 [h, h]
            contrib = jax.lax.dot_general(
                oh_ref[k],
                lut,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # Node j is not conditioned on itself; k is static, j traced.
            acc = acc + jnp.where(k == j, 0.0, 1.0) * contrib
        newcode = jnp.argmin(acc, axis=-1)  # [tile] int32
        oh_ref[pl.ds(j, 1)] = (
            (newcode[:, None] == col_ids).astype(jnp.bfloat16)[None]
        )
        return carry

    jax.lax.fori_loop(0, nvisit, visit, 0)

    # Extract codes from the one-hot state (argmax only lowers for f32 in
    # Mosaic, so cast; one-hot values are exactly 0/1 either way).
    out_ref[:] = jnp.stack(
        [
            jnp.argmax(oh_ref[k].astype(jnp.float32), axis=-1).astype(jnp.int32)
            for k in range(m)
        ],
        axis=1,
    )


def _icm_kernel_v2(order_ref, u_ref, bint_ref, b_ref, out_ref, oh_ref, *,
                   m: int, h: int, nvisit: int):
    """One-big-matmul variant: the one-hot state lives contiguously as
    [tile, m*h], so conditioning codebook j is a single
    [tile, m*h] x [m*h, h] MXU matmul against bint[j] (whose (j, j) block is
    pre-zeroed, absorbing the k != j mask into the weights). 1 matmul/visit
    instead of m — the per-op overhead of m small matmuls dominated v1.
    """
    tile = b_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, h), dimension=1)
    # NOTE: splitting the tile into interleaved row-group chains (for MXU/VPU
    # overlap) and a [1, tile, m*h] grouped scratch were both measured SLOWER
    # than this flat layout (2.26M -> 1.76M / 1.74M vec/s at tile=768); the
    # single [tile, m*h] x [m*h, h] matmul per visit is the best form found.

    for k in range(m):
        oh_ref[:, k * h : (k + 1) * h] = (
            b_ref[:, k : k + 1] == col_ids
        ).astype(jnp.bfloat16)

    def visit(s, carry):
        j = order_ref[s]
        w = bint_ref[pl.ds(j, 1)].reshape(m * h, h)  # bf16, (j,j) block zero
        acc = u_ref[:, pl.ds(j, 1), :].reshape(tile, h)
        cond = jax.lax.dot_general(
            oh_ref[:, :],
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        newcode = jnp.argmin(acc + cond, axis=-1)  # [tile] int32
        off = pl.multiple_of(j * h, h)
        oh_ref[:, pl.ds(off, h)] = (newcode[:, None] == col_ids).astype(
            jnp.bfloat16
        )
        return carry

    jax.lax.fori_loop(0, nvisit, visit, 0)

    # Extract codes from the one-hot state (argmax only lowers for f32 in
    # Mosaic, so cast; one-hot values are exactly 0/1 either way).
    out_ref[:] = jnp.stack(
        [
            jnp.argmax(
                oh_ref[:, k * h : (k + 1) * h].astype(jnp.float32), axis=-1
            ).astype(jnp.int32)
            for k in range(m)
        ],
        axis=1,
    )


def _mrf_cost(oh_ref, bint_ref, bint_lo_ref, u_flat, xsq, *, m: int, h: int,
              tile: int):
    """Per-vector MRF cost from the one-hot state, at fp32-grade precision:

        cost = ||x||^2 + <OH, U> + sum_{j<k} bin[k, j][B_k, B_j]

    The pairwise term reuses the j-stacked VISIT LUT (and its bf16 lo
    residual): for each j, the k>j row block of bint[j] contracted against
    the k>j one-hot columns gives sum_{k>j} bin[k, j][B_k, :], and a dot
    with one-hot j picks B_j. Upper-triangle-only costs m(m-1)*h^2 FLOPs/row
    per hi/lo part — 2.3x less than the [mh, mh] full-matrix matmul it
    replaces, and it needs NO extra [mh, mh] VMEM resident (that resident
    was 49 MB at m=7, h=512 — the difference between fitting and OOM).
    One-hot operands are exact in bf16; hi+lo carries ~16 LUT mantissa
    bits, so the result tracks exact fp32 to ~1e-5 relative.
    """
    ohf = oh_ref[:, :].astype(jnp.float32)  # [tile, m*h]
    pair = jnp.zeros((tile,), jnp.float32)
    for j in range(m - 1):
        lo_row = (j + 1) * h
        ohs = oh_ref[:, lo_row:]  # [tile, (m-1-j)*h]
        yh = jax.lax.dot_general(
            ohs, bint_ref[j, lo_row:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tile, h]
        yl = jax.lax.dot_general(
            ohs, bint_lo_ref[j, lo_row:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ohj = ohf[:, j * h : (j + 1) * h]
        pair = pair + jnp.sum((yh + yl) * ohj, axis=-1)
    return xsq + jnp.sum(ohf * u_flat, axis=-1) + pair


def _ils_kernel(*refs, m: int, h: int, icmiter: int, rounds: int, npert: int,
                milestones: tuple = (), with_stats: bool = False):
    """Whole-ILS kernel: rounds x (perturb -> ICM sweeps -> cost ->
    accept-if-better) with codes resident in VMEM for the entire encode.

    Everything the reference round-trips to the host for per ILS iteration
    (curand perturbation, per-visit LUT uploads, cost + accept on host;
    encode_icm_cuda.jl:124-223) happens in-kernel: perturbation randomness is
    precomputed with jax.random and streamed in (tiny blocks), conditioning
    is one-hot x LUT matmuls. The round cost used for accept decisions is
    fp32-grade (~1e-5 relative, not raw-bf16 ~4e-3 — see CLAUDE.md's accept
    invariant): _mrf_cost contracts the resident j-stacked LUT plus its
    bf16 residual (hi + lo recovers ~16 mantissa bits; one-hot operands are
    exact in bf16), upper-triangle pairs only.

    Optional outputs (static config):
    - milestones: round indices (1-based) at which to snapshot best codes +
      cost, the reference GPU encoder's `ilsiters::Vector` API
      (encode_icm_cuda.jl:26,211-222) done in ONE launch;
    - with_stats: per-round [count(improved), count(changed code entries)],
      the reference's "% codes equal / % better" prints
      (encode_icm.jl:181-184).
    """
    (visits_ref, u_ref, bint_ref, bint_lo_ref, xsq_ref, b_ref,
     pkeys_ref, pcodes_ref) = refs[:8]
    idx = 8
    out_b_ref, out_cost_ref = refs[idx], refs[idx + 1]
    idx += 2
    out_ms_b_ref = out_ms_cost_ref = stats_ref = None
    if milestones:
        out_ms_b_ref, out_ms_cost_ref = refs[idx], refs[idx + 1]
        idx += 2
    if with_stats:
        stats_ref = refs[idx]
        idx += 1
    oh_ref = refs[idx]

    tile = b_ref.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, h), dimension=1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (tile, m), dimension=1)

    def set_oh_from_codes(codes):
        # codes [tile, m] int32 -> one-hot state.
        for k in range(m):
            oh_ref[:, k * h : (k + 1) * h] = (
                codes[:, k : k + 1] == col_ids
            ).astype(jnp.bfloat16)

    def extract_codes():
        return jnp.stack(
            [
                jnp.argmax(
                    oh_ref[:, k * h : (k + 1) * h].astype(jnp.float32), axis=-1
                ).astype(jnp.int32)
                for k in range(m)
            ],
            axis=1,
        )

    def state_cost():
        return _mrf_cost(
            oh_ref, bint_ref, bint_lo_ref,
            u_ref[:, :, :].reshape(tile, m * h), xsq_ref[:, 0],
            m=m, h=h, tile=tile,
        )

    set_oh_from_codes(b_ref[:])
    best_codes = b_ref[:]
    best_cost = state_cost()

    def one_round(r, carry):
        best_codes, best_cost, stats_acc = carry

        # --- Perturb npert distinct codebooks per row with random codes ---
        keys = pkeys_ref[r]  # [tile, m] f32 iid uniforms
        rnd_codes = pcodes_ref[r]  # [tile, npert] int32 in [0, h)
        def pick(p, keys):
            pos = jnp.argmin(keys, axis=-1).astype(jnp.int32)  # [tile]
            keys = jnp.where(lane_m == pos[:, None], jnp.float32(1e30), keys)
            newoh = (rnd_codes[:, p : p + 1] == col_ids).astype(jnp.bfloat16)
            for k in range(m):
                sel = (pos == k)[:, None]
                oh_ref[:, k * h : (k + 1) * h] = jnp.where(
                    sel, newoh, oh_ref[:, k * h : (k + 1) * h]
                )
            return keys
        for p in range(npert):  # npert is small and static
            keys = pick(p, keys)

        # --- ICM sweeps (visit sequence is per-round, scalar-prefetched) ---
        # NOTE: splitting rows into interleaved chains for MXU/VPU overlap
        # is blocked by Mosaic (mixed static-sublane + dynamic-lane stores
        # crash the compiler), and predicated static stores measured no
        # faster than the dynamic store — the serialized
        # matmul->argmin->store chain (~6 us/visit) is the current bound.
        def visit(t, carry2):
            j = visits_ref[r * (icmiter * m) + t]
            w = bint_ref[pl.ds(j, 1)].reshape(m * h, h)
            acc = u_ref[:, pl.ds(j, 1), :].reshape(tile, h)
            cond = jax.lax.dot_general(
                oh_ref[:, :], w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            newcode = jnp.argmin(acc + cond, axis=-1)
            newoh = (newcode[:, None] == col_ids).astype(jnp.bfloat16)
            off = pl.multiple_of(j * h, h)
            oh_ref[:, pl.ds(off, h)] = newoh
            return carry2

        jax.lax.fori_loop(0, icmiter * m, visit, 0)

        # --- Accept-if-better, restore state otherwise ---
        newcost = state_cost()
        better = newcost < best_cost
        equal = newcost == best_cost  # reference stat (encode_icm.jl:180)
        cand = extract_codes()
        best_codes = jnp.where(better[:, None], cand, best_codes)
        best_cost = jnp.where(better, newcost, best_cost)
        bet = better[:, None]
        for k in range(m):
            keep = oh_ref[:, k * h : (k + 1) * h]
            restored = (best_codes[:, k : k + 1] == col_ids).astype(jnp.bfloat16)
            oh_ref[:, k * h : (k + 1) * h] = jnp.where(bet, keep, restored)

        if with_stats:
            # Scalar reductions ([1, tile] -> [1]) don't lower in Mosaic;
            # reduce along sublanes into full [128] lane vectors instead and
            # select the round's row of the carried accumulator (pure
            # vector ops, no dynamic stores).
            cb = jnp.sum(
                jnp.broadcast_to(
                    better.astype(jnp.float32)[:, None], (tile, 128)
                ),
                axis=0,
            )  # [128], every lane = count(better)
            cc = jnp.sum(
                jnp.broadcast_to(
                    equal.astype(jnp.float32)[:, None], (tile, 128)
                ),
                axis=0,
            )  # count(proposal cost == previous) — padded rows always
            # satisfy this (xsq floor -1e30); the wrapper subtracts them.
            lane = jax.lax.broadcasted_iota(jnp.int32, (rounds, 128), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rounds, 128), 0)
            vec = jnp.where(lane == 0, cb[None, :], jnp.where(
                lane == 1, cc[None, :], 0.0))
            stats_acc = jnp.where(row == r, vec, stats_acc)

        for s, ms in enumerate(milestones):
            @pl.when(r == ms - 1)
            def _write_ms(s=s, codes=best_codes, cost=best_cost):
                out_ms_b_ref[s] = codes
                out_ms_cost_ref[s] = cost[:, None]

        return best_codes, best_cost, stats_acc

    stats0 = jnp.zeros((rounds, 128), jnp.float32)
    best_codes, best_cost, stats_acc = jax.lax.fori_loop(
        0, rounds, one_round, (best_codes, best_cost, stats0)
    )
    out_b_ref[:] = best_codes
    out_cost_ref[:] = best_cost[:, None]
    if with_stats:
        stats_ref[0] = stats_acc


def _ils_kernel_pp(*refs, m: int, h: int, icmiter: int, rounds: int,
                   npert: int, milestones: tuple = (),
                   with_stats: bool = False, parts: int = 2):
    """Software-pipelined whole-ILS kernel: the tile is split into `parts`
    independent row slices with SEPARATE one-hot state buffers, and their
    visits are interleaved so slice p+1's conditioning matmul (MXU) can
    overlap slice p's argmin + one-hot store (VPU). The plain kernel's
    matmul->argmin->store chain is fully serialized by the RAW dependency
    through the single one-hot buffer (~6-7 us/visit vs ~2-3 us of matmul);
    separate buffers break it. Separate scratch refs also avoid the Mosaic
    crash on mixed static-sublane + dynamic-lane stores that blocked the
    round-1 interleaving attempt (see the NOTE in _ils_kernel).

    parts=2 is the r2 "pp" variant; parts=4 ("pp4", VERDICT r2 item 7)
    keeps two visits in flight even when a slice's VPU tail outlasts one
    matmul, at the cost of smaller (but still >=128-row) matmuls.

    Semantics identical to _ils_kernel (same visits, same accept rule; row
    slices never interact — ILS is row-independent).
    """
    (visits_ref, u_ref, bint_ref, bint_lo_ref, xsq_ref, b_ref,
     pkeys_ref, pcodes_ref) = refs[:8]
    idx = 8
    out_b_ref, out_cost_ref = refs[idx], refs[idx + 1]
    idx += 2
    out_ms_b_ref = out_ms_cost_ref = stats_ref = None
    if milestones:
        out_ms_b_ref, out_ms_cost_ref = refs[idx], refs[idx + 1]
        idx += 2
    if with_stats:
        stats_ref = refs[idx]
        idx += 1
    oh_refs = refs[idx : idx + parts]

    tile = b_ref.shape[0]
    half = tile // parts  # rows per slice
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (half, h), dimension=1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (half, m), dimension=1)
    halves = tuple((oh_refs[p], p * half) for p in range(parts))

    def set_oh(oh_ref, codes):
        for k in range(m):
            oh_ref[:, k * h : (k + 1) * h] = (
                codes[:, k : k + 1] == col_ids
            ).astype(jnp.bfloat16)

    def extract_codes(oh_ref):
        return jnp.stack(
            [
                jnp.argmax(
                    oh_ref[:, k * h : (k + 1) * h].astype(jnp.float32), axis=-1
                ).astype(jnp.int32)
                for k in range(m)
            ],
            axis=1,
        )

    def state_cost(oh_ref, r0):
        return _mrf_cost(
            oh_ref, bint_ref, bint_lo_ref,
            u_ref[r0 : r0 + half].reshape(half, m * h),
            xsq_ref[r0 : r0 + half, 0],
            m=m, h=h, tile=half,
        )

    for oh_ref, r0 in halves:
        set_oh(oh_ref, b_ref[r0 : r0 + half])
    best = [
        (b_ref[r0 : r0 + half], state_cost(oh_ref, r0))
        for oh_ref, r0 in halves
    ]

    def perturb(oh_ref, r0, r):
        keys = pkeys_ref[r, r0 : r0 + half]
        rnd_codes = pcodes_ref[r, r0 : r0 + half]
        def pick(p, keys):
            pos = jnp.argmin(keys, axis=-1).astype(jnp.int32)
            keys = jnp.where(lane_m == pos[:, None], jnp.float32(1e30), keys)
            newoh = (rnd_codes[:, p : p + 1] == col_ids).astype(jnp.bfloat16)
            for k in range(m):
                sel = (pos == k)[:, None]
                oh_ref[:, k * h : (k + 1) * h] = jnp.where(
                    sel, newoh, oh_ref[:, k * h : (k + 1) * h]
                )
            return keys
        for p in range(npert):
            keys = pick(p, keys)

    def one_round(r, carry):
        parts_state = [
            (carry[2 * p], carry[2 * p + 1]) for p in range(parts)
        ]
        stats_acc = carry[-1]
        for oh_ref, r0 in halves:
            perturb(oh_ref, r0, r)

        def visit(t, carry2):
            j = visits_ref[r * (icmiter * m) + t]
            w = bint_ref[pl.ds(j, 1)].reshape(m * h, h)
            off = pl.multiple_of(j * h, h)
            # Order MM_0, VPU_0, MM_1, VPU_1, ...: slice p+1's matmul has
            # no dependency on slice p's argmin/store, so the MXU can run
            # p+1 while the VPU finishes p; the next iteration's MM_0
            # likewise overlaps the last slice's VPU tail.
            for oh_ref, r0 in halves:
                cond = jax.lax.dot_general(
                    oh_ref[:, :], w,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = (
                    u_ref[r0 : r0 + half, pl.ds(j, 1), :].reshape(half, h)
                    + cond
                )
                new = jnp.argmin(acc, axis=-1)
                oh_ref[:, pl.ds(off, h)] = (
                    new[:, None] == col_ids
                ).astype(jnp.bfloat16)
            return carry2

        jax.lax.fori_loop(0, icmiter * m, visit, 0)

        def accept(oh_ref, r0, best_codes, best_cost):
            newcost = state_cost(oh_ref, r0)
            better = newcost < best_cost
            equal = newcost == best_cost
            cand = extract_codes(oh_ref)
            best_codes = jnp.where(better[:, None], cand, best_codes)
            best_cost = jnp.where(better, newcost, best_cost)
            bet = better[:, None]
            for k in range(m):
                keep = oh_ref[:, k * h : (k + 1) * h]
                restored = (best_codes[:, k : k + 1] == col_ids).astype(
                    jnp.bfloat16
                )
                oh_ref[:, k * h : (k + 1) * h] = jnp.where(bet, keep, restored)
            return best_codes, best_cost, better, equal

        new_state, bets, eqs = [], [], []
        for p, (oh_ref, r0) in enumerate(halves):
            cs, ks, bet, eq = accept(oh_ref, r0, *parts_state[p])
            new_state.append((cs, ks))
            bets.append(bet)
            eqs.append(eq)

        if with_stats:
            cb = jnp.sum(
                sum(
                    jnp.broadcast_to(
                        b.astype(jnp.float32)[:, None], (half, 128)
                    )
                    for b in bets
                ),
                axis=0,
            )
            # count(proposal cost == previous), reference stat; padded rows
            # (xsq floor -1e30) always count — the wrapper subtracts them.
            cc = jnp.sum(
                sum(
                    jnp.broadcast_to(
                        e.astype(jnp.float32)[:, None], (half, 128)
                    )
                    for e in eqs
                ),
                axis=0,
            )
            lane = jax.lax.broadcasted_iota(jnp.int32, (rounds, 128), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (rounds, 128), 0)
            vec = jnp.where(lane == 0, cb[None, :], jnp.where(
                lane == 1, cc[None, :], 0.0))
            stats_acc = jnp.where(row == r, vec, stats_acc)

        for s, ms in enumerate(milestones):
            @pl.when(r == ms - 1)
            def _write_ms(s=s, state=tuple(new_state)):
                for p, (cs, ks) in enumerate(state):
                    r0 = p * half
                    out_ms_b_ref[s, r0 : r0 + half] = cs
                    out_ms_cost_ref[s, r0 : r0 + half] = ks[:, None]

        out = []
        for cs, ks in new_state:
            out += [cs, ks]
        return tuple(out) + (stats_acc,)

    stats0 = jnp.zeros((rounds, 128), jnp.float32)
    init = []
    for cs, ks in best:
        init += [cs, ks]
    final = jax.lax.fori_loop(
        0, rounds, one_round, tuple(init) + (stats0,)
    )
    for p in range(parts):
        r0 = p * half
        out_b_ref[r0 : r0 + half] = final[2 * p]
        out_cost_ref[r0 : r0 + half] = final[2 * p + 1][:, None]
    if with_stats:
        stats_ref[0] = final[-1]


def _pad_h(unaries: Array, binaries_bf16: Array) -> tuple[Array, Array, int]:
    """Pad the code axis h up to a 128-lane multiple.

    Mosaic's shape casts between [tile, m, h] and [tile, m*h] (used for the
    flat one-hot state and the in-kernel cost) only lower when h is a
    multiple of the TPU lane width; h=64 or h=200 crash the compiler
    ("unsupported shape cast"). Padded columns get +1e30 unaries, so argmin
    never selects them, and zero pairwise entries, so a one-hot state over
    real codes contributes nothing through them — semantics are unchanged.
    """
    h = unaries.shape[-1]
    hp = max(128, -(-h // 128) * 128)
    if hp == h:
        return unaries, binaries_bf16, h
    du = hp - h
    unaries = jnp.pad(
        unaries, ((0, 0), (0, 0), (0, du)), constant_values=1e30
    )
    binaries_bf16 = jnp.pad(
        binaries_bf16, ((0, 0), (0, 0), (0, du), (0, du))
    )
    return unaries, binaries_bf16, hp


def ils_kernel_fits(m: int, h: int) -> bool:
    """Whether the whole-ILS kernel's FIXED VMEM residents (the hi + lo
    j-stacked visit/cost LUTs) leave room for any useful tile. At m=7,
    h=1024 the LUTs alone are ~205 MB — no tile size helps; callers should
    fall back to the XLA matmul path (ils_encode does this automatically)."""
    hp = max(128, -(-h // 128) * 128)
    mh = m * hp
    fixed = 2 * m * mh * hp * 2
    return fixed <= 90 * 2**20


def _default_ils_tile(m: int, h: int) -> int:
    """Rows per grid step, from the VMEM budget (measured-calibrated).

    Fixed residents: the hi + lo j-stacked LUT pair (2x [m, m*h, h] bf16 =
    4*m^2*h^2 bytes — ~51 MB at m=7, h=512; the lo stack doubles as the
    visit LUT's residual, so there is no separate [mh, mh] cost LUT any
    more). The tile must still shrink with m*h or the kernel OOMs VMEM —
    the historical calibration point was 162 MB requested at tile=640,
    h=512 under the OLD [mh, mh]-cost-LUT layout (77 MB fixed), mostly
    register-allocator spills of the [tile, mh] f32 cost temporaries; the
    68 B/row/mh-lane per-row figure below was measured there and still
    tracks the current layout's compiler footprint. Per-row cost: unaries
    f32 + one-hot state bf16 + ~6 live [*, mh] f32 temporaries in
    state_cost.
    """
    mh = m * h
    fixed = 2 * m * mh * h * 2  # hi + lo j-stacked LUTs, bf16
    avail = 110 * 2**20 - fixed
    # ~68 bytes/row/mh-lane measured from the compiler's actual footprint
    # (139.6 MB at m=7, h=512, tile=256 with the old [mh, mh] cost LUT:
    # mostly register-allocator spills of [*, mh] f32 temporaries).
    per_row = 68 * mh
    # Best measured at h=256 with the upper-triangle cost path (r2 sweep:
    # 768 > 896 > 640 at m=7; pp variant > base at every tile).
    cap = 768 if m <= 7 else 448
    t = min(cap, max(avail, 0) // per_row)
    return max(64, (t // 16) * 16)


def fused_ils_encode(
    key: Array,
    orders: Array,
    unaries: Array,
    binaries: Array,
    xsq: Array,
    B: Array,
    *,
    ilsiter: int,
    icmiter: int,
    npert: int,
    tile: int | None = None,
    interpret: bool = False,
    milestones=(),
    with_stats: bool = False,
    variant: str | None = None,
) -> tuple:
    """Run the ENTIRE ILS encode (ilsiter rounds) in one kernel launch.

    Thin non-jitted wrapper: resolves the LSQ_TPU_ILS_TILE /
    LSQ_TPU_ILS_VARIANT env knobs and the default tile HERE so they become
    part of the jit cache key (reading them inside the jitted body would
    bake the first-seen value into the cached executable and silently
    ignore later changes), normalizes `milestones` to a hashable tuple,
    and rounds the tile to even for the split-half "pp" variant.
    """
    m = B.shape[1]
    hp = max(128, -(-unaries.shape[-1] // 128) * 128)
    if variant is None:
        variant = os.environ.get("LSQ_TPU_ILS_VARIANT", "pp")
    if tile is None:
        tile = int(
            os.environ.get("LSQ_TPU_ILS_TILE", str(_default_ils_tile(m, hp)))
        )
    if variant in ("pp", "pp4"):
        div = 2 if variant == "pp" else 4
        tile = max(16, tile - (tile % div))
    return _fused_ils_encode_jit(
        key, orders, unaries, binaries, xsq, B,
        ilsiter=ilsiter, icmiter=icmiter, npert=npert, tile=tile,
        interpret=interpret,
        milestones=tuple(milestones) if milestones else (),
        with_stats=with_stats, variant=variant,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "ilsiter", "icmiter", "npert", "tile", "interpret", "milestones",
        "with_stats", "variant",
    ),
)
def _fused_ils_encode_jit(
    key: Array,
    orders: Array,
    unaries: Array,
    binaries: Array,
    xsq: Array,
    B: Array,
    *,
    ilsiter: int,
    icmiter: int,
    npert: int,
    tile: int,
    interpret: bool,
    milestones: tuple,
    with_stats: bool,
    variant: str,
) -> tuple:
    """Jitted body of fused_ils_encode (which resolves tile/variant).

    Args:
      key: jax PRNG key for the perturbation randomness (precomputed on host
        side of the kernel and streamed in as tiny per-tile blocks).
      orders: [ilsiter, m] int32 per-round ICM visit permutations.
      unaries/B: as in fused_icm_sweeps; binaries: [m, m, h, h] float32
        (cast to bf16 in here for the visit path; split hi/lo for the
        fp32-grade cost path); xsq: per-vector ||x||^2.
      milestones: strictly-increasing 1-based round indices to snapshot
        (reference `ilsiters` API, encode_icm_cuda.jl:26).
      with_stats: also return per-round [n_improved, n_changed_entries]
        counts (includes the <tile padded rows only as never-better,
        never-changed — their xsq is pinned to -1e30 so accept is never
        taken).

    Returns (codes [n, m] int32, cost [n] float32, ms_b [n_ms, n, m] | None,
    ms_cost [n_ms, n] | None, stats [ilsiter, 2] | None). Costs come from
    the hi/lo split-bf16 MRF decomposition (~1e-5 relative of exact fp32).
    """
    if milestones:
        assert tuple(sorted(set(milestones))) == tuple(milestones), milestones
        assert milestones[-1] <= ilsiter, (milestones, ilsiter)
    n, m = B.shape
    h_real = unaries.shape[-1]
    binaries = binaries.astype(jnp.float32)
    unaries, binaries, h = _pad_h(unaries, binaries)
    pad = (-n) % tile
    if pad:
        B = jnp.concatenate([B, jnp.zeros((pad, m), B.dtype)])
        unaries = jnp.concatenate([unaries, jnp.zeros((pad, m, h))])
        # Padded rows get -1e30 "cost floor": adding real-scale terms cannot
        # change the float, so newcost == best_cost and they never accept or
        # count as changed in the stats.
        xsq = jnp.concatenate(
            [xsq, jnp.full((pad,), -1e30, xsq.dtype)]
        )
    npad = n + pad
    # The j-stacked visit LUT (bf16 round of the binaries) doubles as the
    # hi part of the fp32-grade cost path (_mrf_cost); its bf16 residual
    # is the lo part. Stacking is linear, so stack-then-round == round-
    # then-stack and the diagonal zeroing carries through. _split_hi_lo's
    # optimization_barrier is load-bearing (excess-precision folding).
    from local_search_quantization_tpu.ops.select_pallas import _split_hi_lo

    b_hi, b_lo = _split_hi_lo(binaries)
    bint = binaries_to_j_stacked(b_hi)  # [m, m*h, h]
    bint_lo = binaries_to_j_stacked(b_lo)
    visits = jnp.repeat(
        orders.astype(jnp.int32), icmiter, axis=0
    ).reshape(-1)  # [ilsiter * icmiter * m]; same order within a round

    kkeys, kcodes = jax.random.split(key)
    pert_keys = jax.random.uniform(kkeys, (ilsiter, npad, m), jnp.float32)
    pert_codes = jax.random.randint(
        kcodes, (ilsiter, npad, npert), 0, h_real, dtype=jnp.int32
    )

    n_ms = len(milestones)
    ngrid = npad // tile
    out_specs = [
        pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
        pl.BlockSpec((tile, 1), lambda i, *_: (i, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((npad, m), jnp.int32),
        jax.ShapeDtypeStruct((npad, 1), jnp.float32),
    ]
    if milestones:
        out_specs += [
            pl.BlockSpec((n_ms, tile, m), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((n_ms, tile, 1), lambda i, *_: (0, i, 0)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((n_ms, npad, m), jnp.int32),
            jax.ShapeDtypeStruct((n_ms, npad, 1), jnp.float32),
        ]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, ilsiter, 128), lambda i, *_: (i, 0, 0)))
        out_shapes.append(
            jax.ShapeDtypeStruct((ngrid, ilsiter, 128), jnp.float32)
        )

    if variant in ("pp", "pp4"):
        parts = 2 if variant == "pp" else 4
        kernel_fn = functools.partial(_ils_kernel_pp, parts=parts)
        scratch = [
            pltpu.VMEM((tile // parts, m * h), jnp.bfloat16)
            for _ in range(parts)
        ]
    else:
        kernel_fn = _ils_kernel
        scratch = [pltpu.VMEM((tile, m * h), jnp.bfloat16)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # visits
        grid=(ngrid,),
        in_specs=[
            pl.BlockSpec((tile, m, h), lambda i, *_: (i, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1)),
            pl.BlockSpec((m, m * h, h), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((m, m * h, h), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec((tile, 1), lambda i, *_: (i, 0)),
            pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
            pl.BlockSpec((ilsiter, tile, m), lambda i, *_: (0, i, 0)),
            pl.BlockSpec((ilsiter, tile, npert), lambda i, *_: (0, i, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        kernel_fn, m=m, h=h, icmiter=icmiter, rounds=ilsiter, npert=npert,
        milestones=milestones, with_stats=with_stats,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        # The default 16 MB scoped-vmem cap is conservative; v5e cores have
        # far more VMEM and this kernel's working set + compiler temporaries
        # need headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(visits, unaries, bint, bint_lo, xsq[:, None], B, pert_keys, pert_codes)
    out_b, out_cost = outs[0][:n], outs[1][:n, 0]
    oi = 2
    ms_b = ms_cost = stats = None
    if milestones:
        ms_b, ms_cost = outs[oi][:, :n], outs[oi + 1][:, :n, 0]
        oi += 2
    if with_stats:
        stats = jnp.sum(outs[oi][:, :, :2], axis=0)  # [ilsiter, 2] counts
        # Padded rows always register "proposal cost equal" (their xsq
        # floor freezes the cost); remove them from that count.
        stats = jnp.maximum(stats - jnp.asarray([0.0, float(pad)]), 0.0)
    return out_b, out_cost, ms_b, ms_cost, stats


def binaries_to_j_stacked(binaries_bf16):
    """[m, m, h, h] -> [m, m*h, h] with the (j, j) diagonal blocks zeroed:
    bint[j][k*h + a, c] = binaries[k, j][a, c], bint[j][j*h:(j+1)*h] = 0."""
    m, _, h, _ = binaries_bf16.shape
    bint = jnp.moveaxis(binaries_bf16, 1, 0)  # [j, k, h, h]
    mask = (1 - jnp.eye(m, dtype=binaries_bf16.dtype))[:, :, None, None]
    return (bint * mask).reshape(m, m * h, h)


def fused_icm_sweeps(
    B: Array,
    unaries: Array,
    binaries_bf16: Array,
    order: Array,
    *,
    icmiter: int,
    tile: int | None = None,
    interpret: bool = False,
    variant: str = "v2",
) -> Array:
    """Per-round ICM sweeps kernel (see _fused_icm_sweeps_jit). Thin
    wrapper resolving LSQ_TPU_ICM_TILE outside jit so the knob is part of
    the cache key (cf. fused_ils_encode)."""
    m = B.shape[1]
    if tile is None:
        # Best measured config at m=7, h=256 (see benchmarks/): 768 rows
        # with the unaries block single-buffered. m=8 needs the smaller
        # tile to fit bint (8.4 MB) + oh (4 MB) + unaries in VMEM.
        default = 768 if m <= 7 else 512
        tile = int(os.environ.get("LSQ_TPU_ICM_TILE", str(default)))
    return _fused_icm_sweeps_jit(
        B, unaries, binaries_bf16, order, icmiter=icmiter, tile=tile,
        interpret=interpret, variant=variant,
    )


@functools.partial(
    jax.jit, static_argnames=("icmiter", "tile", "interpret", "variant")
)
def _fused_icm_sweeps_jit(
    B: Array,
    unaries: Array,
    binaries_bf16: Array,
    order: Array,
    *,
    icmiter: int,
    tile: int | None = None,
    interpret: bool = False,
    variant: str = "v2",
) -> Array:
    """Run icmiter full ICM sweeps in one fused kernel launch.

    Args:
      B: [n, m] int32 codes (n must be a multiple of `tile`; ils_encode pads).
      unaries: [n, m, h] float32.
      binaries_bf16: [m, m, h, h] bfloat16 (cast once per encode; one-hot
        operands are exact in bf16, so only LUT values are rounded — and the
        ILS accept step re-checks costs in fp32).
      order: [m] int32 visit permutation, identical across vectors.
      icmiter: number of sweeps.
    """
    n, m = B.shape
    unaries, binaries_bf16, h = _pad_h(unaries, binaries_bf16)
    pad = (-n) % tile
    if pad:
        B = jnp.concatenate([B, jnp.zeros((pad, m), B.dtype)])
        unaries = jnp.concatenate(
            [unaries, jnp.zeros((pad, m, h), unaries.dtype)]
        )
    npad = n + pad
    visits = jnp.tile(order.astype(jnp.int32), icmiter)  # [icmiter * m]

    if variant == "v2":
        bint = binaries_to_j_stacked(binaries_bf16)  # [m, m*h, h]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(npad // tile,),
            in_specs=[
                # Single-buffer the unaries block: its DMA (~5 us) is dwarfed
                # by per-tile compute (~100 us), and double-buffering it is
                # what blows the VMEM budget at larger tiles.
                pl.BlockSpec(
                    (tile, m, h),
                    lambda i, *_: (i, 0, 0),
                    pipeline_mode=pl.Buffered(buffer_count=1),
                ),
                pl.BlockSpec((m, m * h, h), lambda i, *_: (0, 0, 0)),
                pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
            scratch_shapes=[pltpu.VMEM((tile, m * h), jnp.bfloat16)],
        )
        kernel = functools.partial(
            _icm_kernel_v2, m=m, h=h, nvisit=icmiter * m
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((npad, m), jnp.int32),
            interpret=interpret,
        )(visits, unaries, bint, B)
        return out[:n]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(npad // tile,),
        in_specs=[
            pl.BlockSpec((tile, m, h), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((m, m, h, h), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, m), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((m, tile, h), jnp.bfloat16)],
    )
    kernel = functools.partial(
        _icm_kernel, m=m, h=h, nvisit=icmiter * m
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, m), jnp.int32),
        interpret=interpret,
    )(visits, unaries, binaries_bf16, B)
    return out[:n]

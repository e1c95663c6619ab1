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
  f32-grade ADC distances); precision="bf16" (opt-in serving mode) rounds
  the LUTs once and drops the lo matmul — half the scan MXU work, still
  an exact lexicographic top-k of the rounded-table distances;
- selection: each query keeps an insertion-sorted top-k buffer in VMEM.
  Per code tile, elements are extracted only while they beat the current
  per-query threshold (expected total inserts per query without warm start
  = k + k*ln(n/k) ~ 8k at k=1000, n=1M);
- warm start (scan_topk_warm): a strided-sample pre-scan estimates a
  conservative k-th-distance bound per query, passed in as a static
  threshold — inserts drop to ~1.3-2x k (the ln(n/k) factor disappears),
  with an exactness certificate (buffer slot k-1 filled => provably exact;
  the rare under-capture is detected and falls back to an exact cold run);
- the sorted buffer doubles as the kernel output: results come back
  already sorted ascending, ids exact. Output order is (dist, id)-
  LEXICOGRAPHIC — equal distances ascend by id across every variant, and
  on the sorted/grouped k <= 2048 routes the ids surviving at the
  k-th-value boundary are also exactly the lowest — matching the native
  host scanner (native/lsq_native.cpp), lax.top_k's stable tie rule (the
  sharded-mesh merge and the scan fallbacks), and np.lexsort oracles, so
  route-parity holds even on tie-heavy (small-h) data. The deep-k
  grouped_unsorted flavor keeps a value-strict threshold in-kernel (lex
  replace-worst measured -29% qps at cap ~10k), so its RAW boundary-tie
  survival is arrival-biased; the single-chip driver (adc._run_scan)
  restores the exact lex contract two-phase: one extra output column
  certifies the boundary (every skipped element >= the buffer's final
  max, so d[k-1] < d[k] proves no tie-mate was lost) and the measure-
  zero tied queries rerun through the lex-exact grouped sorted kernel;
- variant="unsorted" replaces the insertion-sorted buffer with a
  replace-worst buffer (~2x fewer vector passes per insert) and defers
  sorting to ONE post-kernel XLA key-value sort over the raw [nq, cap]
  buffers;
- variant="key" (warm-start only) is the fast path at large k: the scan
  drops the lo matmul (half the MXU work), each distance is packed ONCE
  into a monotone int32 key with the tile lane index in the low 13 bits
  (min-reduce returns value AND argmin in one pass, sidestepping Mosaic's
  f32-only argmin), and extraction APPENDS ids below the warm threshold
  to a per-query cursor — no in-loop buffer maintenance at all. Exact f32
  distances are recovered OUTSIDE the kernel by re-ranking the appended
  ids against the full-precision LUTs; a certificate built from the
  hi-matmul error bound (plus overflow detection) falls back to the
  exact hi/lo path when the margin is too tight to prove exactness.

Grid is (query blocks, code tiles); the base codes stream through VMEM with
automatic double buffering while the query block's LUTs and buffer stay
resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MININT = -2147483648
_MAXINT = 2147483647
_LANE_BITS = 13  # low bits of the packed key carry the tile lane (tb<=8192)


def _onehot_tile(codes_ref, m: int, h: int, tb: int):
    """[m*h, tb] bf16 one-hot of a transposed code tile (codes_ref [m, tb]).

    Codes live device-side in the [m, n] transposed layout: an [n, m] int32
    array would be lane-padded m -> 128 by the TPU tiled layout (observed
    live: an s32[64M, 7] segment allocating 34 GB), an 18x HBM capacity and
    bandwidth tax; [m, n] pads only 7 -> 8 sublanes. Bonus: building the
    one-hot row-blocked needs no in-kernel transposes at all."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, tb), dimension=0)
    return jnp.concatenate(
        [
            (codes_ref[i : i + 1, :] == row_ids).astype(jnp.bfloat16)
            for i in range(m)
        ],
        axis=0,
    )


def _dist_tile(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref,
               m: int, h: int, tb: int):
    """f32-grade [nqt, tb] distance tile: two bf16 matmuls over the hi/lo
    split LUTs (see _split_hi_lo) plus the per-row norm term. Shared by the
    sorted/unsorted and grouped kernels so the contraction (dimension
    numbers, accumulation dtype) cannot drift between variants; the key
    kernel intentionally uses a hi-only half-work version.

    lut_lo_ref=None is the precision="bf16" serving mode: ONE matmul over
    the bf16-rounded LUTs (half the MXU scan work) with f32 accumulation —
    the exact distance of the ROUNDED tables, not an approximation of the
    f32 one (see fused_scan_topk's precision arg)."""
    oh = _onehot_tile(codes_ref, m, h, tb)  # [m*h, tb]
    dhi = jax.lax.dot_general(
        lut_hi_ref[:, :], oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if lut_lo_ref is None:
        return dhi + extra_ref[0, :][None, :]
    dlo = jax.lax.dot_general(
        lut_lo_ref[:, :], oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dhi + dlo + extra_ref[0, :][None, :]


def _select_kernel(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref, t0_ref,
                   out_d_ref, out_i_ref, dist_ref, *,
                   m: int, h: int, k: int, cap: int, tb: int, nqt: int,
                   unsorted: bool = False):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_d_ref[:] = jnp.full((nqt, cap), jnp.inf, jnp.float32)
        out_i_ref[:] = jnp.full((nqt, cap), -1, jnp.int32)

    # --- Distances for this tile: 2 bf16 matmuls (hi/lo split LUTs). ---
    dist_ref[:] = _dist_tile(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref,
                             m, h, tb)

    # --- Extract every element beating the per-query threshold, which is
    # min(buffer bound, warm-start bound t0), where the buffer bound is the
    # k-th best so far (sorted variant) or the cap-th best (unsorted). The
    # threshold only tightens, so killing an inactive query's tile-minimum
    # is always safe (it is >= the threshold and can never be needed
    # later). The loop carries the next (min, argmin) AND the current
    # threshold, so neither a "pending" pass over the [nqt, tb] tile nor a
    # repeated buffer reduction is ever made.
    lane_cap = jax.lax.broadcasted_iota(jnp.int32, (nqt, cap), dimension=1)
    lane_tb = jax.lax.broadcasted_iota(jnp.int32, (nqt, tb), dimension=1)

    def kth():
        if unsorted:
            # Unsorted buffer: the max is the cap-th best (cap >= k) — a
            # looser but still exact threshold; the caller's one XLA sort
            # over [nq, cap] restores sorted-output semantics.
            buf_kth = jnp.max(out_d_ref[:, :], axis=1, keepdims=True)
        else:
            buf_kth = jax.lax.slice(out_d_ref[:, :], (0, k - 1), (nqt, k))
        return jnp.minimum(buf_kth, t0_ref[:, :])  # [nqt, 1]

    def min_arg():
        dist = dist_ref[:, :]
        vmin = jnp.min(dist, axis=1, keepdims=True)  # [nqt, 1]
        idx = jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]
        return vmin, idx

    def body(carry):
        vmin, idx, thr, _ = carry
        act = vmin < thr  # [nqt, 1]

        # Kill the extracted element (unconditionally: inactive queries'
        # minima are >= the monotonically-tightening threshold).
        dist_ref[:, :] = jnp.where(lane_tb == idx, jnp.inf, dist_ref[:, :])

        gid = t * tb + idx
        buf_d, buf_i = out_d_ref[:, :], out_i_ref[:, :]
        if unsorted:
            # Replace-worst: overwrite the current max slot (argmax of an
            # all-inf initial buffer walks the slots left to right).
            wpos = jnp.argmax(buf_d, axis=1).astype(jnp.int32)[:, None]
            mask = (lane_cap == wpos) & act
            new_d = jnp.where(mask, vmin, buf_d)
            out_d_ref[:, :] = new_d
            out_i_ref[:, :] = jnp.where(mask, gid, buf_i)
            thr = jnp.minimum(
                jnp.max(new_d, axis=1, keepdims=True), t0_ref[:, :]
            )
        else:
            # Predicated sorted insert at pos = #(buffer <= v): equal
            # values keep arrival order, and extraction emits equal values
            # lowest-id-first, so tie blocks come out ASCENDING by id —
            # the same (dist, id)-lexicographic contract as the native
            # host scanner and lax.top_k (act guarantees pos <= k-1 < cap:
            # vmin < thr <= buf[k-1] bounds every <=-counted slot below
            # k-1). Inactive rows get pos = cap, which leaves the buffer
            # untouched (every lane is "below" the insert point).
            pos = jnp.sum(
                (buf_d <= vmin).astype(jnp.int32), axis=1, keepdims=True
            )
            pos = jnp.where(act, pos, cap)
            below = lane_cap < pos
            at = lane_cap == pos
            new_d = jnp.where(
                below, buf_d,
                jnp.where(at, vmin, pltpu.roll(buf_d, 1, axis=1)),
            )
            out_d_ref[:, :] = new_d
            out_i_ref[:, :] = jnp.where(
                below, buf_i,
                jnp.where(at, gid, pltpu.roll(buf_i, 1, axis=1)),
            )
            thr = jnp.minimum(
                jax.lax.slice(new_d, (0, k - 1), (nqt, k)), t0_ref[:, :]
            )

        vmin2, idx2 = min_arg()
        cont = jnp.sum((vmin2 < thr).astype(jnp.float32))
        return vmin2, idx2, thr, cont

    vmin0, idx0 = min_arg()
    thr0 = kth()
    cont0 = jnp.sum((vmin0 < thr0).astype(jnp.float32))
    jax.lax.while_loop(
        lambda c: c[3] > 0.0, body, (vmin0, idx0, thr0, cont0)
    )


def _select_kernel_grouped(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref,
                           t0_ref, out_d_ref, out_i_ref, dist_ref,
                           fv_ref, fi_ref, *,
                           m: int, h: int, k: int, cap: int, tb: int,
                           nqt: int, unsorted: bool = False):
    """Two-level extraction (variant="grouped"): up to 128 elements per
    full-width pass instead of 1.

    The plain kernel's bound is extraction iterations x full-width
    [nqt, tb] passes (BASELINE.md round-3 analysis: per-row lane
    compaction is a vectorization wall, so it extracts ONE element per
    pass). This kernel sidesteps the wall with UNIFORM extraction: each
    pass computes the exact (min, argmin) of every lane class
    (class c = lanes congruent to c mod 128) via a compare-select fold
    pyramid [nqt, tb] -> [nqt, 128] — contiguous halves, so every op is
    a >=128-wide static slice — then kills all 128 class minima at once
    (ids tiled back up by lane-concat doubling) and runs the usual
    threshold extraction loop on the 128-wide candidate matrix, where a
    min/argmin/kill iteration costs tb/128 times less. Rows and classes
    never diverge: every class extracts its minimum every pass whether
    or not it beats the threshold, which is safe because the threshold
    only tightens (same monotonicity argument as _select_kernel's
    unconditional kill). The outer loop re-runs the pyramid until no
    remaining element beats the threshold, so the result is exact.

    Tie contract: unlike the plain kernel — whose extraction order is
    globally (value, id)-sorted by construction, making its strict-<
    value threshold lexicographically exact for free — grouped extraction
    interleaves pyramid rounds, so a class's SECOND element at a tied
    value can arrive after another class's higher id. In the sorted
    flavor the threshold is therefore a lexicographic (value, id) PAIR
    everywhere it is compared (accept, insert position, loop
    continuation, outer remaining-work test): a candidate equal in value
    to the current k-th best still enters if its id is lower. Both
    components only tighten, so the unconditional-kill safety argument
    is unchanged, and the output is the exact lexicographic (dist, id)
    top-k — identical to the plain kernel and the native host scanner
    even under massive exact ties. The unsorted flavor (the k > 2048
    route) keeps the cheap value-strict threshold — the lex replace-worst
    measured -29% qps at cap ~10k — so its boundary-tie survival is
    arrival-biased like the tournament's (retained ties still return
    id-ascending via the caller's num_keys=2 sort).

    Reference design point being replaced: the C++ scanner's serial
    heap/partial_sort over the scanned block
    (/root/reference/src/linscan/cpp/linscan_aqd.cpp:82-91)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_d_ref[:] = jnp.full((nqt, cap), jnp.inf, jnp.float32)
        out_i_ref[:] = jnp.full((nqt, cap), -1, jnp.int32)

    dist_ref[:] = _dist_tile(lut_hi_ref, lut_lo_ref, codes_ref, extra_ref,
                             m, h, tb)

    lane_cap = jax.lax.broadcasted_iota(jnp.int32, (nqt, cap), dimension=1)
    lane_tb = jax.lax.broadcasted_iota(jnp.int32, (nqt, tb), dimension=1)
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (nqt, 128), dimension=1)

    def class_minima():
        """Exact (value, absolute lane) of each mod-128 lane class, via
        log2(tb/128) compare-select folds of contiguous halves. Folds
        compare (value, lane) lexicographically, so each class minimum is
        the LOWEST absolute lane at the class's min value — together with
        min_arg128's abs-lane tie-break this makes the extraction order
        (value, id)-lexicographic, identical to _select_kernel's
        argmin-first-occurrence rule. Tie id-order (which ids survive at
        the k-th-value boundary) therefore matches the sorted variant and
        the native host scanner.

        The folds run through the fv/fi scratch refs as 128-aligned
        static WINDOW loads/stores rather than shape-changing vector
        slices: Mosaic's vector_extract_strided_slice lowering aborts
        (Check failed: limits[i] <= dim(i)) on width-halving slices
        inside the nested scf.while regions on real TPU (interpret mode
        cannot see it) — memory windows lower through tpu.load/store and
        are layout-safe."""
        fv_ref[:, :] = dist_ref[:, :]
        fi_ref[:, :] = lane_tb
        w = tb
        while w > 128:
            w //= 2
            va, vb = fv_ref[:, 0:w], fv_ref[:, w:2 * w]
            ia, ib = fi_ref[:, 0:w], fi_ref[:, w:2 * w]
            take = (va < vb) | ((va == vb) & (ia <= ib))
            fv_ref[:, 0:w] = jnp.where(take, va, vb)
            fi_ref[:, 0:w] = jnp.where(take, ia, ib)
        return fv_ref[:, 0:128], fi_ref[:, 0:128]  # [nqt, 128]

    def kill(ci):
        """Kill the 128 extracted lanes: lane l is an extracted class
        minimum iff l == ci[q, l % 128]. One width-128 window per lane
        block (static 128-aligned offsets; see class_minima for why not
        a concat/tiled full-width compare)."""
        for off in range(0, tb, 128):
            blk = dist_ref[:, off:off + 128]
            dist_ref[:, off:off + 128] = jnp.where(
                lane_g + off == ci, jnp.inf, blk
            )

    def kth():
        """Lexicographic (value, id) acceptance boundary: the buffer's
        boundary pair tightened by the warm bound t0. When t0 is the
        binding component the id bound is _MININT (t0 stays a STRICT
        value bound — warm-certificate semantics unchanged); id -1 on
        unfilled (inf) slots is harmless for the same reason (nothing
        compares equal to inf)."""
        if unsorted:
            # Value-strict boundary (tid = _MININT disables the id leg of
            # lex_beats): the lex replace-worst needs ~4 extra [nqt, cap]
            # passes per insert, measured -29% qps at the k=10000 route's
            # cap (1,096 -> 779 on the v5e) — not worth it for the deep-k
            # flavor, whose boundary-tie survival is therefore
            # arrival-biased (retained ties still come back id-ascending
            # via the caller's num_keys=2 sort). The sorted flavor below
            # is the k <= 2048 production route and stays exactly
            # lexicographic.
            buf_kth = jnp.max(out_d_ref[:, :], axis=1, keepdims=True)
            thr = jnp.minimum(buf_kth, t0_ref[:, :])  # [nqt, 1]
            tid = jnp.full((nqt, 1), _MININT, jnp.int32)
        else:
            buf_kth = jax.lax.slice(out_d_ref[:, :], (0, k - 1), (nqt, k))
            buf_ik = jax.lax.slice(out_i_ref[:, :], (0, k - 1), (nqt, k))
            thr = jnp.minimum(buf_kth, t0_ref[:, :])  # [nqt, 1]
            tid = jnp.where(buf_kth <= t0_ref[:, :], buf_ik, _MININT)
        return thr, tid

    def lex_beats(v, i, thr, tid):
        """(v, i) lexicographically below the (thr, tid) boundary."""
        return (v < thr) | ((v == thr) & (i < tid))

    def min_arg128(cv, ci):
        """(min, class, absolute lane) over the [nqt, 128] candidates
        WITHOUT jnp.argmin: Mosaic fails to legalize argmin's f32->i32
        vector cast at single-vreg width inside these nested scf regions
        ("unrealized_conversion_cast vector<8x128xf32> to i32", measured
        on the v5e toolchain). Cross-class value ties break toward the
        LOWEST ABSOLUTE LANE (ci, not the class index): with
        class_minima's lexicographic folds this reproduces the plain
        kernel's argmin-first-occurrence extraction order exactly, so
        tie id SETS at the k boundary agree across variants. The class
        is lane mod 128 (tb is a power of two >= 128, so & 127)."""
        vmin = jnp.min(cv, axis=1, keepdims=True)
        lane = jnp.min(
            jnp.where(cv == vmin, ci, tb), axis=1, keepdims=True
        )
        return vmin, jnp.bitwise_and(lane, 127), lane

    def narrow(cv, ci, thr, tid):
        """Threshold extraction over the [nqt, 128] candidates — the
        plain kernel's loop at 1/(tb/128) the per-iteration width, with
        the buffer discipline (sorted insert / replace-worst) from
        _select_kernel made (value, id)-lexicographic: acceptance,
        insert position, and the continuation test all compare pairs
        (see the kernel docstring's tie-contract paragraph). The loop
        carry (vmin, lane) is the lex-MIN of the remaining candidates
        (min_arg128 tie-breaks on abs lane), so the single-pair
        continuation test is exhaustive."""

        def nbody(c):
            cv, vmin, cls, lane, thr, tid, _ = c
            gid = t * tb + lane
            act = lex_beats(vmin, gid, thr, tid)
            cv = jnp.where(lane_g == cls, jnp.inf, cv)

            buf_d, buf_i = out_d_ref[:, :], out_i_ref[:, :]
            if unsorted:
                # Replace-worst with a value-strict threshold (tid stays
                # _MININT — see kth() for the measured reason): overwrite
                # the current max slot (argmax of an all-inf initial
                # buffer walks the slots left to right).
                wpos = jnp.argmax(buf_d, axis=1).astype(jnp.int32)[:, None]
                mask = (lane_cap == wpos) & act
                new_d = jnp.where(mask, vmin, buf_d)
                out_d_ref[:, :] = new_d
                out_i_ref[:, :] = jnp.where(mask, gid, buf_i)
                thr = jnp.minimum(
                    jnp.max(new_d, axis=1, keepdims=True), t0_ref[:, :]
                )
            else:
                # Lexicographic insert position: #(buffer pairs lex-below
                # the new pair). act bounds pos <= k-1 < cap (the new
                # pair lex-beats the k-1 boundary pair).
                pos = jnp.sum(
                    ((buf_d < vmin) | ((buf_d == vmin) & (buf_i < gid)))
                    .astype(jnp.int32),
                    axis=1, keepdims=True,
                )
                pos = jnp.where(act, pos, cap)
                below = lane_cap < pos
                at = lane_cap == pos
                new_d = jnp.where(
                    below, buf_d,
                    jnp.where(at, vmin, pltpu.roll(buf_d, 1, axis=1)),
                )
                new_i = jnp.where(
                    below, buf_i,
                    jnp.where(at, gid, pltpu.roll(buf_i, 1, axis=1)),
                )
                out_d_ref[:, :] = new_d
                out_i_ref[:, :] = new_i
                kv = jax.lax.slice(new_d, (0, k - 1), (nqt, k))
                ki = jax.lax.slice(new_i, (0, k - 1), (nqt, k))
                thr = jnp.minimum(kv, t0_ref[:, :])
                tid = jnp.where(kv <= t0_ref[:, :], ki, _MININT)
            vmin2, cls2, lane2 = min_arg128(cv, ci)
            cont = jnp.sum(
                lex_beats(vmin2, t * tb + lane2, thr, tid)
                .astype(jnp.float32)
            )
            return cv, vmin2, cls2, lane2, thr, tid, cont

        vmin0, cls0, lane0 = min_arg128(cv, ci)
        cont0 = jnp.sum(
            lex_beats(vmin0, t * tb + lane0, thr, tid).astype(jnp.float32)
        )
        out = jax.lax.while_loop(
            lambda c: c[6] > 0.0, nbody,
            (cv, vmin0, cls0, lane0, thr, tid, cont0),
        )
        return out[4], out[5]  # tightened (thr, tid)

    def remaining(thr, tid):
        """Does any non-killed element still lex-beat the boundary? The
        full-width lex-min (min value, then lowest lane at it) — two
        passes instead of the plain kernel's one; the pyramid only runs
        when this is true."""
        rmin = jnp.min(dist_ref[:, :], axis=1, keepdims=True)
        rlane = jnp.min(
            jnp.where(dist_ref[:, :] == rmin, lane_tb, tb),
            axis=1, keepdims=True,
        )
        beat = lex_beats(rmin, t * tb + rlane, thr, tid)
        return jnp.sum(beat.astype(jnp.float32))

    def obody(carry):
        thr, tid, _ = carry
        cv, ci = class_minima()
        kill(ci)
        thr, tid = narrow(cv, ci, thr, tid)
        return thr, tid, remaining(thr, tid)

    thr0, tid0 = kth()
    jax.lax.while_loop(
        lambda c: c[2] > 0.0, obody, (thr0, tid0, remaining(thr0, tid0))
    )


def _f32_to_key(b):
    """Signed-int32-monotone map of f32 bit patterns: x < y (as floats)
    iff key(x) < key(y) (as SIGNED int32s). b: int32 bitcast of f32.
    Standard trick: non-negative floats keep their bits; negative floats
    map to MININT - bits (exact within the float range; -0.0 -> 0)."""
    return jnp.where(b >= 0, b, _MININT - b)


def _key_to_f32_bits(key):
    """Inverse of _f32_to_key (the map is an involution on bit space)."""
    return jnp.where(key >= 0, key, _MININT - key)


def _select_kernel_key(lut_hi_ref, codes_ref, extra_ref, t0_ref,
                       out_i_ref, out_cnt_ref, key_ref, *,
                       m: int, h: int, cap: int, tb: int, nqt: int):
    """Append-mode extraction on packed monotone keys (variant="key").

    Every element with hi-matmul distance below the warm threshold t0 is
    appended (id only) at the query's cursor. The packed key =
    (monotone19(dist) & ~0x1FFF) | lane gives min-reduce-with-argmin in a
    single i32 pass, and there is no buffer maintenance: no k-th slice,
    no replace-worst scan, no threshold tightening. Exactness is settled
    by the caller (re-rank + certificate)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_i_ref[:] = jnp.full((nqt, cap), -1, jnp.int32)
        out_cnt_ref[:] = jnp.zeros((nqt, 1), jnp.int32)

    # --- hi-only distances (half the MXU work of the hi/lo scan). ---
    oh = _onehot_tile(codes_ref, m, h, tb)  # [m*h, tb]
    dhi = jax.lax.dot_general(
        lut_hi_ref[:, :], oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = dhi + extra_ref[0, :][None, :]
    lane_tb = jax.lax.broadcasted_iota(jnp.int32, (nqt, tb), dimension=1)
    b = jax.lax.bitcast_convert_type(acc, jnp.int32)
    key_ref[:] = (_f32_to_key(b) & (-(1 << _LANE_BITS))) | lane_tb

    t0b = jax.lax.bitcast_convert_type(t0_ref[:, :], jnp.int32)
    t0k = _f32_to_key(t0b) & (-(1 << _LANE_BITS))  # [nqt, 1]

    lane_cap = jax.lax.broadcasted_iota(jnp.int32, (nqt, cap), dimension=1)

    def body(carry):
        vkey, cnt, _ = carry
        act = vkey < t0k  # [nqt, 1] i32 compare
        idx = vkey & ((1 << _LANE_BITS) - 1)

        # Kill the extracted lane; MAXINT is above every real key.
        key_ref[:, :] = jnp.where(lane_tb == idx, _MAXINT, key_ref[:, :])

        # Append the global id at the cursor (cursor >= cap drops the
        # append; the caller detects overflow from the final count).
        pos = jnp.where(act, cnt, cap)
        out_i_ref[:, :] = jnp.where(
            lane_cap == pos, t * tb + idx, out_i_ref[:, :]
        )
        cnt = cnt + act.astype(jnp.int32)

        vkey2 = jnp.min(key_ref[:, :], axis=1, keepdims=True)
        cont = jnp.sum((vkey2 < t0k).astype(jnp.float32))
        return vkey2, cnt, cont

    cnt0 = out_cnt_ref[:, :]
    vkey0 = jnp.min(key_ref[:, :], axis=1, keepdims=True)
    cont0 = jnp.sum((vkey0 < t0k).astype(jnp.float32))
    vkey, cnt, _ = jax.lax.while_loop(
        lambda c: c[2] > 0.0, body, (vkey0, cnt0, cont0)
    )
    out_cnt_ref[:, :] = cnt


def _split_hi_lo(x: Array) -> tuple[Array, Array]:
    """f32 -> (bf16 hi, bf16 lo residual), hi + lo carrying ~16 mantissa
    bits. The barrier forces the hi rounding to MATERIALIZE: under
    --xla_allow_excess_precision=true (set by some TPU runtimes) XLA keeps
    the bf16 cast in excess f32 precision, folding the residual to zero
    and silently degrading the split to plain bf16 (found live: 5e-3
    relative ADC error instead of ~1e-5)."""
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def round_bf16(x: Array) -> Array:
    """Round to bf16 ONCE, materialized — the serving fast-mode metric.

    The single home for the barrier idiom (shared by ops/adc and
    parallel/query): under --xla_allow_excess_precision=true XLA keeps a
    bare bf16 cast in excess f32 precision ON TPU ONLY, silently
    UN-rounding the tables (CPU/interpret tests cannot see it — the same
    failure class _split_hi_lo documents). Callers wanting the rounded
    values back in f32 add .astype(jnp.float32)."""
    return jax.lax.optimization_barrier(x.astype(jnp.bfloat16))


def _pick_nqt(nq: int) -> int:
    """Query-block rows: one big block minimizes extraction iterations
    (sum over tiles of max-over-queries hit counts — measured 3,828 qps at
    nqt=1024 vs 891 at nqt=256, and 6,796 vs 6,643 for one 2048-block vs
    two 1024-blocks, k=1000, n=1M on a v5e); small query sets get the next
    power of two to avoid 10x pad waste. Capped at 2048: with the k <=
    2048 routing gate the VMEM working set stays ~65 MB."""
    nqt = 128
    while nqt < 2048 and nqt < nq:
        nqt *= 2
    return nqt


def _rerank_ids(luts_flat: Array, Bt: Array, extra: Array, ids: Array,
                m: int, h: int):
    """Exact f32 distances for candidate ids straight from the LUTs (the
    tournament's O(1)-memory gather-recompute idiom, ops/adc.py); -1
    sentinel ids come back +inf. Bt is the transposed [m, n] code layout,
    so codebook i of point p lives at flat i*n + p."""
    nqp, cap = ids.shape
    n = Bt.shape[1]
    ids_c = jnp.maximum(ids, 0)
    codes = jnp.take(
        Bt.reshape(-1),
        (ids_c[..., None]
         + n * jnp.arange(m, dtype=jnp.int32)).reshape(nqp, -1),
    ).reshape(nqp, cap, m)
    gidx = jnp.arange(m, dtype=jnp.int32)[None, None, :] * h + codes
    exact = jnp.sum(
        jnp.take_along_axis(
            luts_flat, gidx.reshape(nqp, cap * m), axis=1
        ).reshape(nqp, cap, m),
        axis=2,
    ) + jnp.take(extra, ids_c)
    return jnp.where(ids < 0, jnp.inf, exact)


def select_geometry(k: int, n: int | None = None, mh: int | None = None,
                    *, m: int | None = None, h: int | None = None):
    """Measured-optimal (variant, tb, nqt) for the fused select kernel.

    The single source of truth for the default kernel geometry, shared by
    the single-chip route (ops/adc._run_scan) and the sharded route
    (parallel/query.sharded_scan_topk) so both hit one compiled shape
    family. Values are the round-3 v5e sweep (BASELINE.md "grouped
    variant" section; 1M base, m=7, h=256):

    - k <= 2048: variant="grouped" (fold-pyramid two-level extraction,
      up to 128 extractions per full-width pass) at tb=8192. Warm qps at
      k=1000, nq=2048: 8,426 vs the previous sorted/tb=4096 default's
      6,456 (+31%); k=100 cold 11,908 / warm 12,068 vs sorted's ~10.1k
      cold. Bigger tiles keep paying once extraction passes are 1/64
      width: tb 4096 -> 8192 moved k=1000 from 7,643 to 8,426.
    - k > 2048: variant="grouped_unsorted" (replace-worst buffer + one
      post-kernel XLA sort; sorted inserts are O(cap) at this depth) at
      tb=8192, nqt=256: 1,183 qps at k=10000 (two runs: 1,181/1,183) vs
      tb=4096's 1,065-1,076 and the plain unsorted 1,028. The earlier
      "tb=8192 regresses" note (1,019) was measured at nqt=128 — at the
      VMEM-maximal nqt=256 the bigger tile wins here too. nqt=384 loses
      at tb=4096 (1,104) and OOMs VMEM at tb=8192 (135.4M/128M, mostly
      register spill slots); variant="key" (append + exact re-rank) at
      this depth measures 368-374 qps — the [nq, ~15k]-candidate re-rank
      gather is the wall, closing that design door with a number.

    n (optional) caps tb at the padded problem size so interpret-mode
    tests over tiny bases don't pay 8192-wide padding.

    Prefer passing (m, h) — the raw LUT dims, luts.shape[1:3] — and let
    this function apply fused_scan_topk's 128-lane h padding itself, so
    the VMEM model and the kernel's allocation can never diverge across
    callers. mh (the pre-padded flat width) stays accepted for direct
    sweeps/tests.

    mh (optional) is the flat LUT width m*h (h after 128-lane padding):
    the kernel's tile-side VMEM scales with tb*mh (the [m*h, tb] bf16
    one-hot, tb*mh*2 bytes). Measured on the v5e at the 128-bit widths
    (k=1000, nq=2048, 1M codes, BASELINE.md 128-bit section): tb=8192
    still wins — m=15 warm 5,798 qps vs 5,379 (tb=4096) / 4,814
    (tb=2048); m=16 5,534 vs 5,050 / 4,583 — with the in-function VMEM
    guard stepping the auto query block 256 -> 128. tb therefore halves
    only when the bf16 one-hot tile alone exceeds 70 MB (m*h > 4480,
    e.g. h=512 wide codes), leaving every measured width at 8192. At
    k > 2048 the [nqt, cap] buffer windows stack on the wider LUT rows:
    the 64-bit nqt=256 default OOMs at m*h=4096/tb=8192 (142.8M/128M
    measured), so wide deep-k geometries step nqt to 128.

    Env overrides (tuning sweeps): LSQ_TPU_SELECT_VARIANT,
    LSQ_TPU_SELECT_TB, LSQ_TPU_SELECT_NQT.
    """
    import os as _os

    if m is not None or h is not None:
        if m is None or h is None or mh is not None:
            raise ValueError("pass (m, h) together, and not with mh")
        mh = m * (-(-h // 128) * 128)
    if k > 2048:
        variant, tb, nqt = "grouped_unsorted", 8192, 256
        if mh is not None and mh > 2048:
            nqt = 128  # wide-code deep-k: nqt=256 OOMs (see docstring)
    else:
        variant, tb, nqt = "grouped", 8192, None
    if mh is not None:
        # Validated at the widest measured shape (round 5, m=16 h=512 =
        # mh=8192, k=1000, nq=2048, 1M codes, warm): this rule's tb=4096
        # runs at 3,485 qps with the auto query block stepped down by the
        # kernel's VMEM guard, beating tb=2048 (3,372) and tb=1024
        # (3,003), while tb=8192 is a measured compile OOM (150M/128M).
        # EXPLICIT nqt at these widths remains the documented sweep
        # footgun (nqt=2048 at tb=2048/mh=8192 compiles to 175M).
        while tb > 1024 and tb * mh * 2 > 70 * 2**20:
            tb //= 2
    if n is not None:
        while tb > 256 and tb // 2 >= n:
            tb //= 2
    variant = _os.environ.get("LSQ_TPU_SELECT_VARIANT", variant)
    env_tb = int(_os.environ.get("LSQ_TPU_SELECT_TB", "0"))
    if env_tb:
        # Fail here with the remedy, not in the kernel's assert: the
        # grouped fold pyramid needs a power-of-two tile, and since
        # grouped became the DEFAULT variant, a pre-existing sweep that
        # only sets TB would otherwise crash deep in fused_scan_topk.
        if (env_tb & (env_tb - 1) or env_tb < 128) \
                and variant.startswith("grouped"):
            raise ValueError(
                f"LSQ_TPU_SELECT_TB={env_tb} is not a power of two >= 128, "
                f"which the '{variant}' variant's fold pyramid "
                "requires (class minima are 128-lane blocks) — use a "
                "power-of-two tb >= 128 or also set "
                "LSQ_TPU_SELECT_VARIANT=sorted/unsorted")
        tb = env_tb
    env_nqt = int(_os.environ.get("LSQ_TPU_SELECT_NQT", "0"))
    if env_nqt:
        nqt = env_nqt
    return variant, tb, nqt


@functools.partial(
    jax.jit,
    static_argnames=("k", "tb", "nqt", "interpret", "variant", "append_cap",
                     "precision"),
)
def fused_scan_topk(
    luts: Array,
    Bt: Array,
    extra: Array,
    *,
    k: int,
    tb: int = 1024,
    nqt: int | None = None,
    interpret: bool = False,
    t0: Array | None = None,
    variant: str = "sorted",
    append_cap: int | None = None,
    precision: str = "f32",
):
    """Exact kNN over the full base in ONE kernel launch per query set.

    Args:
      luts: [nq, m, h] float32 per-query ADC tables.
      Bt: [m, n] int32 codes, TRANSPOSED device layout (see _onehot_tile:
        [n, m] would be lane-padded m -> 128 on TPU HBM, an 18x capacity
        tax that OOMs 64M-row segments); n is padded here to a tile
        multiple.
      extra: [n] float32 additive term (db norms; zeros for PQ). Padded
        rows get +inf so they can never be selected.
      k: neighbors to return (sorted ascending).
      t0: optional [nq, 1] float32 warm-start threshold (see
        scan_topk_warm): only elements with distance < t0 are collected.
        The result is certified exact iff dists[:, k-1] < t0.
      variant: "sorted" keeps an insertion-sorted buffer; "unsorted"
        keeps a replace-worst buffer (~2x fewer buffer passes per insert)
        and runs ONE XLA key-value sort after the kernel — both are
        exact with identical output semantics (ties may order ids
        differently). "grouped" is the sorted buffer behind a two-level
        extraction (fold-pyramid class minima: up to 128 extractions per
        full-width pass — see _select_kernel_grouped); exact, same
        output contract, requires tb a power of two >= 128.
        "grouped_unsorted" combines the two-level extraction with the
        replace-worst buffer + one post-kernel XLA sort (the large-k
        geometry, where sorted inserts are O(cap)).
        "key" REQUIRES a finite t0 (scan_topk_warm provides
        it): hi-only scan + packed-monotone-key append extraction + exact
        XLA re-rank, returning (dists, ids, bad) where `bad` flags the
        certificate (hi-matmul error bound vs the k-th margin, and
        append-buffer overflow) — the caller falls back to an exact
        variant when set.
      precision: "f32" (default) scans with the hi/lo split — f32-grade
        distances, the reference scanners' precision. "bf16" is the
        serving fast mode: the LUTs are rounded ONCE to bf16 and the lo
        matmul is dropped entirely (half the MXU scan work, and the lo
        LUT's VMEM freed). The result is still an EXACT lexicographic
        top-k — of the distances computed from the rounded tables (f32
        accumulation), a deterministic contract rather than a tolerance:
        adc._run_scan rounds the LUTs for its non-kernel routes the same
        way, so route parity holds in this mode too. Relative distance
        error vs f32 is bounded by the bf16 half-ulp (~2^-9) per LUT
        entry over m summed entries; recall impact is measured in
        BASELINE.md (bf16 serving mode section). Not combinable with
        variant="key" (already hi-only by construction, with an exact
        re-rank on top).

    Per-shard use inside shard_map requires check_vma=False on the
    shard_map (parallel/query.py does this): pallas outputs carry no
    varying-manual-axes type, and the kernel-internal iotas would clash
    with vma-typed operands under the interpret-mode trace.

    Returns (dists [nq, k] f32, ids [nq, k] int32); variant="key" returns
    (dists, ids, bad) with `bad` a device-side scalar bool.
    """
    nq, m, h = luts.shape
    n = Bt.shape[1]
    if h % 128:
        # Pad the per-codebook LUT axis to the TPU lane width (cf. the ILS
        # kernel's _pad_h: Mosaic rejects shape casts at odd widths). Codes
        # stay < h, so the one-hot never selects a padded column and the
        # padded LUT entries (zeros) never contribute.
        hp = -(-h // 128) * 128
        luts = jnp.pad(luts, ((0, 0), (0, 0), (0, hp - h)))
        h = hp
    if precision not in ("f32", "bf16"):
        raise ValueError(f"precision must be 'f32' or 'bf16', got "
                         f"{precision!r}")
    hi_only = precision == "bf16"
    key_mode = variant == "key"
    if key_mode:
        assert t0 is not None, "variant='key' requires a warm threshold"
        assert tb <= (1 << _LANE_BITS), (tb, 1 << _LANE_BITS)
        assert not hi_only, (
            "variant='key' is hi-only by construction (with an exact "
            "re-rank); precision='bf16' applies to the buffer variants")
    auto_nqt = nqt is None
    if auto_nqt:
        nqt = _pick_nqt(nq)
    if key_mode:
        # Append capacity: every element below t0 lands here. The warm
        # caller sizes it from its sampling statistics (mean + 5 sd of
        # the below-t0 count, see scan_topk_warm); overflow is
        # certificate-detected, never assumed away.
        cap = append_cap if append_cap is not None else (
            -(-(k * 5 // 2) // 128) * 128
        )
    else:
        cap = max(128, -(-k // 128) * 128)
    # VMEM guard (calibrated on a live OOM: nqt=2048 at m*h=2048, tb=2048,
    # cap=1024 compiles to ~115 MB): per-query-row cost = hi/lo LUTs +
    # dist/key scratch + buffers + compiler slack; step the query block
    # down until the estimate fits the 127 MB scoped limit with headroom.
    # Applied only to the auto-picked block size — an explicitly requested
    # nqt (e.g. a tuning sweep) is honored as-is and left to the compiler's
    # own VMEM check.
    # Buffer cost per query row: in-kernel scratch PLUS the double-buffered
    # [nqt, cap] output windows (dists f32 + ids i32, x2 buffers = 16*cap;
    # key mode outputs packed i32 keys only = 8*cap). At cap~1k the windows
    # hide inside the fixed slack, but at the k~10000 route (cap~10k) they
    # dominate: nqt=512 at cap=10112 is a measured live OOM while this
    # model correctly steps to the measured-good nqt=256 (BASELINE.md).
    buf_bytes = cap * 12 if key_mode else cap * 24
    # key and bf16 modes carry a single bf16 LUT operand (hi only).
    lut_row = m * h * (2 if key_mode or hi_only else 4)
    # grouped variants carry two extra [nqt, tb] fold scratch refs
    # (f32 values + i32 lanes) on top of the dist scratch.
    scr_bytes = tb * (12 if variant in ("grouped", "grouped_unsorted")
                      else 4)
    per_row = lut_row + scr_bytes + buf_bytes + 22 * 1024
    while (auto_nqt and nqt > 128
           and nqt * per_row + tb * m * h * 4 > 118 * 2**20):
        nqt //= 2

    pad_n = (-n) % tb
    if pad_n:
        Bt = jnp.pad(Bt, ((0, 0), (0, pad_n)))
        extra = jnp.concatenate(
            [extra, jnp.full((pad_n,), jnp.inf, extra.dtype)]
        )
    pad_q = (-nq) % nqt
    if t0 is None:
        t0 = jnp.full((nq, 1), jnp.inf, jnp.float32)
    if pad_q:
        luts = jnp.concatenate(
            [luts, jnp.broadcast_to(luts[-1:], (pad_q, m, h))]
        )
        t0 = jnp.concatenate([t0, jnp.broadcast_to(t0[-1:], (pad_q, 1))])
    nqp = nq + pad_q
    npad = n + pad_n

    flat = luts.reshape(nqp, m * h)
    if hi_only:
        # bf16 serving mode: round ONCE; no lo residual exists here.
        hi = round_bf16(flat)
        lo = None
    else:
        hi, lo = _split_hi_lo(flat)

    grid = (nqp // nqt, npad // tb)
    common_in_specs = [
        pl.BlockSpec((nqt, m * h), lambda q, t: (q, 0)),
        pl.BlockSpec((nqt, m * h), lambda q, t: (q, 0)),
        pl.BlockSpec((m, tb), lambda q, t: (0, t)),
        pl.BlockSpec((1, tb), lambda q, t: (0, t)),
        pl.BlockSpec((nqt, 1), lambda q, t: (q, 0)),
    ]
    if key_mode:
        kernel = functools.partial(
            _select_kernel_key, m=m, h=h, cap=cap, tb=tb, nqt=nqt,
        )
        # hi-only: the key kernel never reads the lo LUT — keeping it out
        # of the specs frees nqt*m*h*2 bytes of VMEM for a larger block.
        out_i, out_cnt = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[common_in_specs[0]] + common_in_specs[2:],
            out_specs=[
                pl.BlockSpec((nqt, cap), lambda q, t: (q, 0)),
                pl.BlockSpec((nqt, 1), lambda q, t: (q, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nqp, cap), jnp.int32),
                jax.ShapeDtypeStruct((nqp, 1), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((nqt, tb), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024
            ),
            interpret=interpret,
        )(hi, Bt, extra[None, :], t0)
        exact = _rerank_ids(flat, Bt, extra, out_i, m, h)
        # num_keys=2: exact-distance ties order ascending by id, matching
        # the sorted/grouped kernels' lexicographic output contract.
        sd, si = jax.lax.sort((exact, out_i), dimension=1, num_keys=2)
        sd, si = sd[:, :k], si[:, :k]
        # --- Certificate. Every skipped element x satisfies
        # packed_key(hi(x)) >= t0k, so hi(x) >= key_to_float(t0k -
        # (2^13 - 1)) =: T_hi, so exact(x) >= T_hi - err, where err
        # bounds |hi - exact| (per-query bf16 LUT rounding: half-ulp rel
        # 2^-9 per entry, m entries summed; f32 accumulation slack folded
        # in). If d_k < T_hi - err, no skipped element can displace any
        # of the k reported (ties at d_k included: value-exact). Overflow
        # of the append buffer voids the reasoning and also flags bad.
        t0b = jax.lax.bitcast_convert_type(t0, jnp.int32)
        # int32 wrap of the -8191 slack would need t0 ~ -3.4e38 (key near
        # MININT) — not a representable ADC threshold; plain i32 is safe.
        t0k_m = (
            (_f32_to_key(t0b) & (-(1 << _LANE_BITS)))
            - ((1 << _LANE_BITS) - 1)
        )
        T_hi = jax.lax.bitcast_convert_type(
            _key_to_f32_bits(t0k_m), jnp.float32
        )
        # Two rounding sources separate the in-kernel hi value from exact:
        # bf16 LUT entries (half-ulp rel 2^-9 per entry, m summed; f32
        # accumulation slack in the 2^-16 term) AND the final f32
        # `dhi + extra` add, whose rounding scales with |extra| — up to
        # 2^-24 * max|extra|, dominant when db norms dwarf the LUT terms
        # (e.g. near-zero queries). 2^-23 leaves a doubling of slack.
        # Max over FINITE entries only: +inf rows (caller padding from
        # adc._run_scan when n % base_block != 0, or Index.delete
        # tombstones) can never be candidates, and folding them in would
        # make err = inf — permanently voiding the certificate.
        e_n = extra[:n]
        e_max = jnp.max(jnp.where(jnp.isfinite(e_n), jnp.abs(e_n), 0.0))
        err = (2.0 ** -9 + 2.0 ** -16) * jnp.sum(
            jnp.max(jnp.abs(luts), axis=2), axis=1, keepdims=True
        ) + 2.0 ** -23 * e_max
        overflow = jnp.any(out_cnt >= cap)
        bad = jnp.any(sd[:, k - 1 :] >= T_hi - err) | overflow
        return sd[:nq], si[:nq], bad

    scratch_shapes = [pltpu.VMEM((nqt, tb), jnp.float32)]
    if variant in ("grouped", "grouped_unsorted"):
        assert tb >= 128 and (tb & (tb - 1)) == 0, (
            "variant='grouped' needs a power-of-two tb (fold pyramid)", tb)
        kernel = functools.partial(
            _select_kernel_grouped, m=m, h=h, k=k, cap=cap, tb=tb, nqt=nqt,
            unsorted=(variant == "grouped_unsorted"),
        )
        scratch_shapes += [
            pltpu.VMEM((nqt, tb), jnp.float32),  # fold values
            pltpu.VMEM((nqt, tb), jnp.int32),  # fold lanes
        ]
    else:
        kernel = functools.partial(
            _select_kernel, m=m, h=h, k=k, cap=cap, tb=tb, nqt=nqt,
            unsorted=(variant == "unsorted"),
        )
    if hi_only:
        # bf16 mode passes no lo operand at all (frees its VMEM window
        # and the second matmul); the kernels take lut_lo_ref=None
        # through _dist_tile.
        full_kernel = kernel

        def kernel(lut_hi_ref, codes_ref, extra_ref, t0_ref, *rest):
            return full_kernel(lut_hi_ref, None, codes_ref, extra_ref,
                               t0_ref, *rest)

        in_specs = [common_in_specs[0]] + common_in_specs[2:]
        operands = (hi, Bt, extra[None, :], t0)
    else:
        in_specs = common_in_specs
        operands = (hi, lo, Bt, extra[None, :], t0)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nqt, cap), lambda q, t: (q, 0)),
            pl.BlockSpec((nqt, cap), lambda q, t: (q, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nqp, cap), jnp.float32),
            jax.ShapeDtypeStruct((nqp, cap), jnp.int32),
        ],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    if variant in ("unsorted", "grouped_unsorted"):
        # One key-value sort over the cap-wide raw buffers for the WHOLE
        # query set (never per tile): restores the sorted-ascending output
        # contract at ~cap*log^2(cap) XLA sort cost amortized over the
        # full scan. num_keys=2 makes equal-distance ties ascend by id
        # (the replace-worst buffer holds slots in arbitrary order) — the
        # same lexicographic contract as every other route. Sentinel rows
        # (+inf, -1) sort to the tail and are sliced off with the padding.
        out_d, out_i = jax.lax.sort((out_d, out_i), dimension=1, num_keys=2)
    return out_d[:nq, :k], out_i[:nq, :k]


def scan_topk_warm(
    luts: Array,
    Bt: Array,
    extra: Array,
    *,
    k: int,
    tb: int = 2048,
    nqt: int | None = None,
    interpret: bool = False,
    sample_stride: int = 16,
    min_n: int = 1 << 16,
    sample_rank: int | None = None,
    deferred: bool = False,
    min_k: int = 512,
    variant: str = "sorted",
    precision: str = "f32",
):
    """fused_scan_topk with a sampled warm-start threshold. Always exact.

    Bt: [m, n] transposed device codes (see fused_scan_topk).

    Pre-scans every `sample_stride`-th code and takes each query's
    `rank`-th sample distance as a static pruning bound t0, where rank =
    k/stride + 6*sqrt(k/stride) (a >=6-sigma upper bound on the true k-th
    distance, so P[t0 < true kth] ~ 1e-8 per query). The main scan then
    inserts only elements < t0 — expected inserts drop from k*(1+ln(n/k))
    (~8k at k=1000, n=1M) to ~1.8k. Exactness certificate: an element ever
    inserted is < t0, so slot k-1 being filled proves >= k elements beat
    t0 and the buffer holds the true sorted top-k; if ANY query's slot
    k-1 is >= t0 (under-capture), rerun everything without the bound.
    variant="key" carries its own certificate (hi-matmul error bound +
    overflow, see fused_scan_topk) which subsumes the under-capture check.

    This is the TPU answer to the C++ scanner's partial_sort design point
    (linscan_aqd.cpp:91): selection cost ~ k, not ~ k*ln(n/k).

    deferred=True returns (dists, ids, bad) with `bad` a device-side scalar
    bool instead of syncing on it here — callers that fetch the results
    anyway (e.g. adc._run_scan) check it at their own fetch boundary and
    rerun cold iff set, saving one ~35 ms host round-trip per query block.
    The NON-deferred form syncs on `bad` inside this call (one host
    round-trip per invocation, ~35 ms floor on a tunneled backend, before
    the caller's own result fetch) — fine for one-shot use; anything
    driving many blocks should pass deferred=True like _run_scan does.

    precision="bf16" (see fused_scan_topk) applies to the pre-scan, the
    main scan, and the cold fallback alike, so the warm bound, the
    certificate, and the results all live in ONE consistent metric (the
    bf16-rounded-LUT distances) — the under-capture reasoning is
    unchanged.
    """
    n = Bt.shape[1]
    if precision == "bf16" and variant == "key":
        raise ValueError("variant='key' is hi-only by construction; "
                         "precision='bf16' applies to the buffer variants")
    key_mode = variant == "key"
    # The key variant's fallback (and the small-k/small-n early path,
    # where its re-rank overhead cannot pay off, and the t0-less cold
    # path it cannot run at all) is the exact f32 "sorted" path.
    exact_variant = "sorted" if key_mode else variant
    # Small k: the cold scan's insert count k*(1+ln(n/k)) is already cheap
    # and the sample pre-scan + certificate overhead outweighs the savings
    # (measured at k=100, n=1M: warm 6.5k qps vs cold 10.1k).
    if k < min_k or k * sample_stride * 2 > n or n < min_n:
        d, i = fused_scan_topk(
            luts, Bt, extra, k=k, tb=tb, nqt=nqt, interpret=interpret,
            variant=exact_variant, precision=precision,
        )
        return (d, i, None) if deferred else (d, i)
    if sample_rank is None:
        kk = k / sample_stride
        sample_rank = int(np.ceil(kk + 6.0 * np.sqrt(kk) + 1.0))
    Bs = Bt[:, ::sample_stride]
    es = extra[::sample_stride]
    ds, _ = fused_scan_topk(
        luts, Bs, es, k=sample_rank, tb=tb, nqt=nqt, interpret=interpret,
        variant=exact_variant, precision=precision,
    )
    t0 = ds[:, sample_rank - 1 : sample_rank]
    if key_mode:
        # Below-t0 count per query: mean ~ rank*stride, sd ~
        # stride*sqrt(rank); mean + 5 sd covers the max over the block.
        cap_hint = int(sample_rank * sample_stride
                       + 5 * sample_stride * np.sqrt(sample_rank) + 64)
        cap_hint = -(-cap_hint // 128) * 128
        d, i, bad = fused_scan_topk(
            luts, Bt, extra, k=k, tb=tb, nqt=nqt, interpret=interpret,
            t0=t0, variant="key", append_cap=cap_hint,
        )
    else:
        d, i = fused_scan_topk(
            luts, Bt, extra, k=k, tb=tb, nqt=nqt, interpret=interpret, t0=t0,
            variant=variant, precision=precision,
        )
        bad = jnp.any(d[:, k - 1 :] >= t0)
    if deferred:
        return d, i, bad
    if bool(np.asarray(bad)):
        # Certificate failed (expected ~never): exact cold run.
        return fused_scan_topk(
            luts, Bt, extra, k=k, tb=tb, nqt=nqt, interpret=interpret,
            variant=exact_variant, precision=precision,
        )
    return d, i

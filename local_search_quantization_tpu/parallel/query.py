"""Sharded ADC query: per-shard top-k scan + all-gather merge over ICI.

The closest thing this domain has to a collective pattern (SURVEY.md §5):
base codes sharded on the data axis, per-query LUTs replicated, each chip
scans its shard and keeps a local top-k, then one all-gather + re-top-k
produces the global result. DCN never sees per-code traffic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from local_search_quantization_tpu.ops.adc import (
    KNNResult,
    _scan_topk,
    lsq_query_luts,
    pq_query_luts,
)
from local_search_quantization_tpu.parallel.mesh import (
    DATA_AXIS, mesh_platform,
)

Array = jax.Array


def sharded_scan_topk(
    mesh: Mesh,
    luts: Array,
    Bt: Array,
    extra: Array | None,
    k: int,
    *,
    block: int = 1 << 15,
    axis: str = DATA_AXIS,
    method: str = "auto",
    deferred: bool = False,
    precision: str = "f32",
    _force_variant: str | None = None,
) -> KNNResult:
    """Scan a sharded code database; return global top-k per query.

    Bt: [m, n] TRANSPOSED device codes (ops/adc.lut_scan_block: the
    [n, m] layout is lane-padded m -> 128 on TPU HBM), sharded on `axis`
    along n (n divisible by mesh size * no padding — callers pad with
    +inf `extra` rows as in ops/adc._run_scan).

    method: "scan" = per-block lax.top_k streaming merge; "kernel" = the
    fused Pallas scan+select kernel per shard (ops/select_pallas.py, the
    single-chip fast path — 16x the scan merge at k=1000; interpreted
    off-TPU); "auto" picks "kernel" on TPU for moderate k.

    Every route is exactly (dist, id)-lexicographic, matching the
    single-chip contract. The replace-worst kernel flavors (deep k) are
    value-strict per shard, so this driver applies the same two-phase
    widen as ops/adc._run_scan: each shard returns k+1 columns, and
    d[k-1] < d[k] in EVERY shard certifies no boundary tie-mate was
    skipped anywhere; tied queries (measure-zero on continuous f32
    distances) rerun through the in-loop-lexicographic grouped sorted
    kernel. The merge itself preserves lex order for free: per-shard
    lists are id-ascending within a tie, shards own ascending global-id
    ranges, and lax.top_k's stable tie-break follows the shard-major
    candidate order — which IS global-id order across shards.

    deferred=True returns (KNNResult, tied) with `tied` an UNRESOLVED
    per-query device bool (None when no widen ran) instead of resolving
    ties internally — the chunked driver (_sharded_linscan) uses this to
    keep its dispatch-all-then-fetch pipeline, fixing tied rows after
    the bulk fetch.

    precision="bf16" is the serving fast mode (ops/select_pallas.
    fused_scan_topk): the LUTs are rounded to bf16 HERE — the single
    barrier site for the mesh path (the chunked _sharded_linscan driver
    and its tie reruns all pass through this boundary) — so BOTH the
    kernel route (which scans hi-only) and the streaming "scan" route
    see the same rounded metric even when this function is called
    directly. The widen/tie certificate and the grouped rerun stay in
    the same rounded metric, so the lex contract is preserved in this
    mode too.
    """
    if precision not in ("f32", "bf16"):
        raise ValueError(f"precision must be 'f32' or 'bf16', got "
                         f"{precision!r}")
    if precision == "bf16":
        from local_search_quantization_tpu.ops.select_pallas import (
            round_bf16,
        )

        # Round at this boundary so a DIRECT method="scan" caller gets
        # the rounded metric its precision label promises (the kernel
        # route re-rounds internally — idempotent; round_bf16's barrier
        # defeats XLA's excess-precision un-rounding on TPU).
        luts = round_bf16(luts).astype(jnp.float32)
    nshards = mesh.shape[axis]
    shard_n = Bt.shape[1] // nshards
    on_tpu = mesh_platform(mesh) == "tpu"  # NOT jax.default_backend():
    # a CPU mesh under a TPU-default process must not get TPU kernels.
    if method == "auto":
        # Mirror ops/adc._run_scan's routing: the select kernel covers the
        # reference's full depth range (k <= 10240, replace-worst buffer
        # beyond 2048); the streaming lax.top_k merge is the fallback.
        method = ("kernel" if on_tpu and k <= 10240 and 4 * k < shard_n
                  else "scan")

    kk = min(k, shard_n)
    variant = tb = nqt = None
    widen = False
    if method == "kernel":
        from local_search_quantization_tpu.ops.select_pallas import (
            select_geometry,
        )

        # Same tuned geometry as the single-chip route (ops/adc.py),
        # via the shared select_geometry (grouped fold-pyramid
        # extraction; BASELINE.md "grouped variant" sweep). One
        # geometry across both paths = one compiled kernel shape;
        # (m, h) raw — select_geometry applies the kernel's 128-lane
        # h padding itself.
        variant, tb, nqt = select_geometry(
            kk, n=shard_n, m=luts.shape[1], h=luts.shape[2])
        if _force_variant is not None:
            variant, nqt = _force_variant, None
        # kk == shard_n needs no widen: the buffer admits every shard row.
        widen = variant in ("unsorted", "grouped_unsorted") and kk < shard_n
    kk_req = kk + 1 if widen else kk

    def local(luts, Bt, extra):
        idx = jax.lax.axis_index(axis)
        n_loc = Bt.shape[1]
        if method == "kernel":
            from local_search_quantization_tpu.ops.select_pallas import (
                fused_scan_topk,
            )

            e = extra if extra is not None else jnp.zeros(
                n_loc, jnp.float32
            )
            d_, i_ = fused_scan_topk(
                luts, Bt, e, k=kk_req, tb=tb, nqt=nqt, variant=variant,
                interpret=not on_tpu, precision=precision,
            )
            if k > n_loc:  # tiny-shard: pad honest sentinels
                padw = k - n_loc
                d_ = jnp.concatenate(
                    [d_, jnp.full((d_.shape[0], padw), jnp.inf)], axis=1
                )
                i_ = jnp.concatenate(
                    [i_, jnp.full((i_.shape[0], padw), -1, jnp.int32)], axis=1
                )
            res = KNNResult(d_, i_)
        else:
            res = _scan_topk(luts, Bt, extra, k, min(block, n_loc),
                             pvary_axis=axis)
        # Unfilled slots (k > valid rows in this shard) carry the -1 id
        # sentinel; offsetting it would forge a plausible id on another
        # shard. Keep the sentinel — its +inf distance loses the merge to
        # any real candidate, and surfaces honestly if none exists.
        gids = jnp.where(res.ids >= 0, res.ids + idx * shard_n, -1)
        # New leading axis of size 1 per shard; shard_map stacks to [S, nq, k].
        return KNNResult(res.dists[None], gids[None])

    in_extra = P(axis) if extra is not None else None
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis), in_extra),
        out_specs=KNNResult(P(axis, None, None), P(axis, None, None)),
        # The pallas path's outputs carry no varying-manual-axes typing
        # (and its internal iotas clash with vma-typed refs under the
        # interpret-mode trace), so vma checking is off for it; the scan
        # path keeps the stricter typing via explicit pcasts.
        check_vma=(method != "kernel"),
    )
    per_shard = fn(luts, Bt, extra)  # [S, nq, kk_req] (k-padded if kk < k)

    tied = None
    if widen:
        # Boundary-tie certificate, per shard: the widened column only
        # matters where it EQUALS the k-th value (+inf == +inf is sentinel
        # padding — fewer than k finite candidates in that shard, already
        # exact). Any shard failing the check may have skipped a tie-mate
        # with a smaller global id, so the whole query reruns.
        d_all = per_shard.dists
        tied = jnp.any(
            (d_all[:, :, kk - 1] == d_all[:, :, kk])
            & jnp.isfinite(d_all[:, :, kk - 1]),
            axis=0,
        )
        per_shard = KNNResult(d_all[:, :, :kk], per_shard.ids[:, :, :kk])

    # Merge the S per-shard top-k lists: one re-top-k over S*k candidates
    # per query (runs as a normal jitted op over the sharded arrays — the
    # all-gather this implies is the query path's only collective).
    nq = per_shard.dists.shape[1]
    nd_all = jnp.moveaxis(-per_shard.dists, 0, 1).reshape(nq, -1)
    id_all = jnp.moveaxis(per_shard.ids, 0, 1).reshape(nq, -1)
    nd, pos = jax.lax.top_k(nd_all, k)
    merged = KNNResult(-nd, jnp.take_along_axis(id_all, pos, axis=1))
    if deferred:
        return merged, tied
    if tied is not None:
        tied_np = np.asarray(tied)
        if tied_np.any():
            from local_search_quantization_tpu.ops.adc import pad_rerun_idx

            tq = np.flatnonzero(tied_np)
            # Bucketed leading dim (ops/adc.pad_rerun_idx): one compiled
            # rerun shape per power-of-two tied-count, not per count.
            tqp = jnp.asarray(pad_rerun_idx(tq))
            fix = sharded_scan_topk(
                mesh, jnp.take(jnp.asarray(luts), tqp, axis=0),
                Bt, extra, k, block=block, axis=axis, method="kernel",
                precision=precision, _force_variant="grouped",
            )
            d_np = np.asarray(merged.dists).copy()
            i_np = np.asarray(merged.ids).copy()
            d_np[tq] = np.asarray(fix.dists)[: len(tq)]
            i_np[tq] = np.asarray(fix.ids)[: len(tq)]
            return KNNResult(d_np, i_np)
    return merged


def prepare_sharded_codes(mesh: Mesh, B, extra=None, *,
                          block: int = 1 << 15, axis: str = DATA_AXIS):
    """Pad + shard the code store ONCE for repeated mesh scans.

    Returns an opaque `device_state` for the sharded_linscan_* drivers —
    the transposed sharded codes and the (+inf-padded) extra term,
    exactly as _sharded_linscan builds them per call. A pod server
    re-querying the same base otherwise re-uploads and re-shards the
    whole store every request (the same per-request tax the single-chip
    route's adc.prepare_device_codes removes; Index.search(mesh=...)
    caches this). Must be built with the same mesh/block/axis the scan
    call uses.

    Staleness: the drivers validate only the padded SIZE of a passed
    state — a size-preserving mutation (e.g. tombstoning via the extra
    term) passes validation and serves stale results. Direct callers
    own the rebuild-after-any-mutation discipline; Index.search is safe
    via its private mutation counter."""
    from local_search_quantization_tpu.parallel.mesh import shard_cols

    B = np.asarray(B)
    n = B.shape[0]
    nshards = mesh.shape[axis]
    pad = (-n) % (nshards * block)
    extra = (np.zeros(n, np.float32) if extra is None
             else np.asarray(extra, np.float32))
    if pad:
        B = np.concatenate([B, np.zeros((pad, B.shape[1]), B.dtype)])
        extra = np.concatenate([extra, np.full(pad, np.inf, np.float32)])
    Bs = shard_cols(mesh, jnp.asarray(np.ascontiguousarray(B.T)), axis)
    es = shard_cols(mesh, jnp.asarray(extra), axis)
    return Bs, es


def _sharded_linscan(
    mesh: Mesh,
    B,
    Q,
    C: Array,
    luts_fn,
    extra,
    k: int,
    *,
    query_chunk: int,
    block: int,
    method: str,
    axis: str,
    precision: str = "f32",
    device_state=None,
) -> KNNResult:
    """Shared multi-chip linscan driver: pad + shard the codes, then
    dispatch ALL query chunks before fetching any (same queue-then-fetch
    pattern as ops/adc._run_scan — a host sync per chunk would serialize
    each shard scan against the ~35 ms dispatch+fetch RPC of a tunneled
    backend; queued results are small, [query_chunk, k] x2 per chunk).

    precision="bf16": the rounding happens at sharded_scan_topk's
    boundary (which both the chunk scans and the tie reruns pass
    through), so the kernel and streaming shard scans, the tie
    certificate, and the grouped rerun all live in one consistent
    rounded metric, and the mesh route's ids match the single-chip bf16
    route id-for-id."""
    if precision not in ("f32", "bf16"):
        raise ValueError(f"precision must be 'f32' or 'bf16', got "
                         f"{precision!r}")
    from local_search_quantization_tpu.parallel.mesh import replicated

    B = np.asarray(B)
    Q = np.asarray(Q)
    n = B.shape[0]
    k = min(k, n)  # padded rows must never be reported as neighbors
    if Q.shape[0] == 0:
        return KNNResult(np.empty((0, k), np.float32),
                         np.empty((0, k), np.int32))
    nshards = mesh.shape[axis]
    if device_state is not None:
        exp = n + ((-n) % (nshards * block))
        if device_state[0].shape[1] != exp:
            raise ValueError(
                f"sharded device_state was prepared for a different "
                f"base/mesh/block (codes dim {device_state[0].shape[1]}, "
                f"expected {exp}) — rebuild with prepare_sharded_codes "
                f"after any mutation")
        Bs, es = device_state
    else:
        Bs, es = prepare_sharded_codes(mesh, B, extra, block=block,
                                       axis=axis)
    Cr = replicated(mesh, jnp.asarray(C))

    results, valid, tie_work = [], [], []
    for start in range(0, Q.shape[0], query_chunk):
        qc = Q[start : start + query_chunk]
        npad = query_chunk - qc.shape[0]
        if npad:
            qc = np.concatenate([qc, np.broadcast_to(qc[-1:], (npad, qc.shape[1]))])
        luts = luts_fn(replicated(mesh, jnp.asarray(qc)), Cr)
        # bf16 rounding now lives at sharded_scan_topk's boundary (both
        # the chunk scan below and the tie rerun pass through it), so
        # the driver no longer rounds — one barrier site per chunk.
        res, tied = sharded_scan_topk(mesh, luts, Bs, es, k, block=block,
                                      method=method, axis=axis, deferred=True,
                                      precision=precision)
        results.append(res)
        valid.append(query_chunk - npad)
        # Keep the chunk's LUTs only while a tie rerun might need them
        # ([query_chunk, m, h] f32 — small next to the sharded codes).
        tie_work.append((tied, luts) if tied is not None else None)
    out_d = [np.asarray(r.dists)[:v] for r, v in zip(results, valid)]
    out_i = [np.asarray(r.ids)[:v] for r, v in zip(results, valid)]
    # Second phase of the deep-k lex contract (see sharded_scan_topk):
    # rerun the certificate-failing queries — measure-zero on continuous
    # f32 distances — through the in-loop-lexicographic grouped kernel,
    # AFTER the bulk fetch so the hot path stays dispatch-all-then-fetch.
    for ci, work in enumerate(tie_work):
        if work is None:
            continue
        t = np.asarray(work[0])[: valid[ci]]
        if not t.any():
            continue
        tq = np.flatnonzero(t)
        from local_search_quantization_tpu.ops.adc import pad_rerun_idx

        # Bucketed leading dim: see sharded_scan_topk's rerun site.
        tqp = jnp.asarray(pad_rerun_idx(tq))
        fix = sharded_scan_topk(
            mesh, jnp.take(work[1], tqp, axis=0), Bs, es, k,
            block=block, axis=axis, method="kernel",
            precision=precision, _force_variant="grouped",
        )
        out_d[ci], out_i[ci] = out_d[ci].copy(), out_i[ci].copy()
        out_d[ci][tq] = np.asarray(fix.dists)[: len(tq)]
        out_i[ci][tq] = np.asarray(fix.ids)[: len(tq)]
    return KNNResult(np.concatenate(out_d), np.concatenate(out_i))


def sharded_linscan_pq(
    mesh: Mesh,
    B,
    Q,
    C_sub: Array,
    k: int,
    *,
    R: Array | None = None,
    extra=None,
    query_chunk: int = 1024,
    block: int = 1 << 15,
    method: str = "auto",
    axis: str = DATA_AXIS,
    precision: str = "f32",
    device_state=None,
) -> KNNResult:
    """Multi-chip PQ/OPQ scanner: shard codes, replicate subspace LUTs.

    Pass R to rotate queries into code space first (OPQ). `extra` is an
    optional [n] additive distance term (e.g. +inf tombstones from
    Index.delete); it defaults to zeros. precision="bf16" is the rounded
    hi-only serving mode (see _sharded_linscan). device_state: pre-
    sharded codes from prepare_sharded_codes (mesh serving hot path).
    """
    Q = np.asarray(Q)
    if R is not None:
        Q = Q @ np.asarray(R)
    return _sharded_linscan(mesh, B, Q, C_sub, pq_query_luts, extra, k,
                            query_chunk=query_chunk, block=block,
                            method=method, axis=axis, precision=precision,
                            device_state=device_state)


def sharded_linscan_lsq(
    mesh: Mesh,
    B,
    Q,
    C: Array,
    db_norms,
    k: int,
    *,
    R: Array | None = None,
    query_chunk: int = 1024,
    block: int = 1 << 15,
    method: str = "auto",
    axis: str = DATA_AXIS,
    precision: str = "f32",
    device_state=None,
) -> KNNResult:
    """Multi-chip additive-code scanner (LSQ/ChainQ + quantized norms).

    Pass R to rotate queries into the code space first (ChainQ).
    precision="bf16" is the rounded hi-only serving mode (see
    _sharded_linscan). device_state: pre-sharded codes from
    prepare_sharded_codes (mesh serving hot path)."""
    Q = np.asarray(Q)
    if R is not None:
        Q = Q @ np.asarray(R)
    return _sharded_linscan(mesh, B, Q, C, lsq_query_luts,
                            np.asarray(db_norms, np.float32), k,
                            query_chunk=query_chunk, block=block,
                            method=method, axis=axis, precision=precision,
                            device_state=device_state)

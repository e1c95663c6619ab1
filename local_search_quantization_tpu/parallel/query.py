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
from local_search_quantization_tpu.parallel.mesh import DATA_AXIS

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
    """
    nshards = mesh.shape[axis]
    shard_n = Bt.shape[1] // nshards
    if method == "auto":
        on_tpu = jax.default_backend() == "tpu"
        method = "kernel" if on_tpu and k <= 2048 and 4 * k < shard_n else "scan"

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
                luts, Bt, e, k=min(k, n_loc),
                interpret=jax.default_backend() != "tpu",
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
    per_shard = fn(luts, Bt, extra)  # [S, nq, k] each

    # Merge the S per-shard top-k lists: one re-top-k over S*k candidates
    # per query (runs as a normal jitted op over the sharded arrays — the
    # all-gather this implies is the query path's only collective).
    nq = per_shard.dists.shape[1]
    nd_all = jnp.moveaxis(-per_shard.dists, 0, 1).reshape(nq, -1)
    id_all = jnp.moveaxis(per_shard.ids, 0, 1).reshape(nq, -1)
    nd, pos = jax.lax.top_k(nd_all, k)
    return KNNResult(-nd, jnp.take_along_axis(id_all, pos, axis=1))


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
) -> KNNResult:
    """Multi-chip PQ/OPQ scanner: shard codes, replicate subspace LUTs.

    Pass R to rotate queries into code space first (OPQ). `extra` is an
    optional [n] additive distance term (e.g. +inf tombstones from
    Index.delete); it defaults to zeros.
    """
    from local_search_quantization_tpu.parallel.mesh import replicated, shard_cols

    B = np.asarray(B)
    Q = np.asarray(Q)
    if R is not None:
        Q = Q @ np.asarray(R)
    n = B.shape[0]
    k = min(k, n)  # padded rows must never be reported as neighbors
    nshards = int(np.prod(list(mesh.shape.values())))
    pad = (-n) % (nshards * block)
    extra = (np.zeros(n, np.float32) if extra is None
             else np.asarray(extra, np.float32))
    if pad:
        B = np.concatenate([B, np.zeros((pad, B.shape[1]), B.dtype)])
        extra = np.concatenate([extra, np.full(pad, np.inf, np.float32)])
    Bs = shard_cols(mesh, jnp.asarray(np.ascontiguousarray(B.T)))
    es = shard_cols(mesh, jnp.asarray(extra))
    Cr = replicated(mesh, jnp.asarray(C_sub))

    # Dispatch ALL chunks before fetching any (same queue-then-fetch
    # pattern as ops/adc._run_scan): a host sync per chunk would serialize
    # each shard scan against the ~35 ms dispatch+fetch RPC of a tunneled
    # backend. Queued results are small ([query_chunk, k] x2 per chunk).
    results, valid = [], []
    for start in range(0, Q.shape[0], query_chunk):
        qc = Q[start : start + query_chunk]
        npad = query_chunk - qc.shape[0]
        if npad:
            qc = np.concatenate([qc, np.broadcast_to(qc[-1:], (npad, qc.shape[1]))])
        luts = pq_query_luts(replicated(mesh, jnp.asarray(qc)), Cr)
        results.append(sharded_scan_topk(mesh, luts, Bs, es, k, block=block,
                                         method=method))
        valid.append(query_chunk - npad)
    out_d = [np.asarray(r.dists)[:v] for r, v in zip(results, valid)]
    out_i = [np.asarray(r.ids)[:v] for r, v in zip(results, valid)]
    return KNNResult(np.concatenate(out_d), np.concatenate(out_i))


def sharded_linscan_lsq(
    mesh: Mesh,
    B,
    Q,
    C: Array,
    db_norms,
    k: int,
    *,
    query_chunk: int = 1024,
    block: int = 1 << 15,
    method: str = "auto",
) -> KNNResult:
    """Multi-chip additive-code scanner driver (host-side query chunking)."""
    from local_search_quantization_tpu.parallel.mesh import replicated, shard_cols

    B = np.asarray(B)
    n = B.shape[0]
    k = min(k, n)  # padded rows must never be reported as neighbors
    nshards = int(np.prod(list(mesh.shape.values())))
    pad = (-n) % (nshards * block)
    extra = np.asarray(db_norms, np.float32)
    if pad:
        B = np.concatenate([B, np.zeros((pad, B.shape[1]), B.dtype)])
        extra = np.concatenate([extra, np.full(pad, np.inf, np.float32)])
    Bs = shard_cols(mesh, jnp.asarray(np.ascontiguousarray(B.T)))
    es = shard_cols(mesh, jnp.asarray(extra))
    Cr = replicated(mesh, jnp.asarray(C))

    # Queue-then-fetch, as in sharded_linscan_pq / ops/adc._run_scan.
    results, valid = [], []
    Q = np.asarray(Q)
    for start in range(0, Q.shape[0], query_chunk):
        qc = Q[start : start + query_chunk]
        npad = query_chunk - qc.shape[0]
        if npad:
            qc = np.concatenate([qc, np.broadcast_to(qc[-1:], (npad, qc.shape[1]))])
        luts = lsq_query_luts(replicated(mesh, jnp.asarray(qc)), Cr)
        results.append(sharded_scan_topk(mesh, luts, Bs, es, k, block=block,
                                         method=method))
        valid.append(query_chunk - npad)
    out_d = [np.asarray(r.dists)[:v] for r, v in zip(results, valid)]
    out_i = [np.asarray(r.ids)[:v] for r, v in zip(results, valid)]
    return KNNResult(np.concatenate(out_d), np.concatenate(out_i))

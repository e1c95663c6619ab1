"""ADC scanners vs brute-force oracles; recall eval; norm quantization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from local_search_quantization_tpu.models import train_pq
from local_search_quantization_tpu.ops import adc, costs, norms
from local_search_quantization_tpu.ops.subspaces import (
    pq_full_codebooks,
    reconstruct_pq,
)
from local_search_quantization_tpu.utils.config import PQConfig
from local_search_quantization_tpu.utils.eval import eval_recall


def test_linscan_pq_matches_bruteforce(rng):
    n, nq, d, m, h = 500, 7, 16, 4, 8
    X = rng.normal(size=(n, d)).astype(np.float32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    model = train_pq(X, PQConfig(m=m, h=h))
    B = np.asarray(model.B)
    k = 20
    res = adc.linscan_pq(B, Q, model.C_sub, k=k, query_chunk=4, base_block=128)
    # Oracle: exact ADC distance = || q - recon ||^2.
    recon = np.asarray(reconstruct_pq(jnp.asarray(B), model.C_sub, d))
    for qi in range(nq):
        d2 = np.sum((recon - Q[qi]) ** 2, axis=1)
        order = np.argsort(d2, kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(res.dists[qi]), np.sort(d2[order]), rtol=1e-3, atol=1e-3
        )
        # Same candidate set modulo ties.
        assert len(set(res.ids[qi]) & set(order)) >= k - 2


def test_linscan_lsq_matches_bruteforce(rng):
    n, nq, d, m, h = 400, 5, 12, 3, 8
    C = (rng.normal(size=(m, h, d)) * 0.5).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbnorms = np.sum(recon * recon, axis=1).astype(np.float32)
    k = 15
    res = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=k, query_chunk=4,
                          base_block=128)
    for qi in range(nq):
        # The scanner's score: -2 q.recon + ||recon||^2 (drops ||q||^2).
        score = -2.0 * recon @ Q[qi] + dbnorms
        order = np.argsort(score, kind="stable")[:k]
        np.testing.assert_allclose(
            np.sort(res.dists[qi]), np.sort(score[order]), rtol=1e-3, atol=1e-3
        )
        assert len(set(res.ids[qi]) & set(order)) >= k - 2


def test_linscan_padding_never_wins(rng):
    # n deliberately not a multiple of base_block.
    n, d, m, h = 100, 8, 2, 4
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(3, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbnorms = np.sum(recon * recon, axis=1).astype(np.float32)
    res = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=50, query_chunk=4,
                          base_block=64)
    assert res.ids.max() < n
    assert res.ids.min() >= 0


def test_eval_recall():
    gt = np.array([5, 3, 9, 0])
    ids = np.array(
        [
            [5, 1, 2, 4],  # rank 1
            [1, 3, 2, 4],  # rank 2
            [1, 2, 4, 9],  # rank 4
            [7, 8, 1, 2],  # not found
        ]
    )
    rec = eval_recall(gt, ids, 4, verbose=False)
    np.testing.assert_allclose(rec, [0.25, 0.5, 0.5, 0.75])


def test_quantize_norms_roundtrip(rng):
    n, d, m, h = 300, 8, 3, 16
    C = (rng.normal(size=(m, h, d)) * 0.5).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    cbnorms, codes = norms.train_norm_codebook(
        jax.random.PRNGKey(0), jnp.asarray(B), jnp.asarray(C), h
    )
    codes2 = norms.quantize_norms(jnp.asarray(B), jnp.asarray(C), cbnorms)
    true = np.asarray(norms.reconstruction_sqnorms(jnp.asarray(B), jnp.asarray(C)))
    approx = np.asarray(cbnorms)[np.asarray(codes2)]
    # Quantized norms are close in relative terms.
    rel = np.abs(approx - true) / np.maximum(true, 1e-6)
    assert np.median(rel) < 0.2
    # quantize_norms at the training set is consistent with its own codebook:
    # every assignment is the argmin.
    d2 = (true[:, None] - np.asarray(cbnorms)[None, :]) ** 2
    np.testing.assert_array_equal(np.asarray(codes2), np.argmin(d2, axis=1))


def test_scalar_kmeans_heavy_tail_quality():
    # SIFT-scale squared norms (~1e5, lognormal): the f64 scalar trainer
    # must keep both the bulk (mean) and the tail (max) quantization
    # error at the intrinsic 256-bin level — values chosen with ~2x
    # slack over measured (mean rel 2.0e-3, max 1.2e4 at spread 4e4).
    v = np.exp(np.random.default_rng(7).normal(np.log(1e5), 0.36, 100_000))
    c = norms.scalar_kmeans(v, 256)
    assert np.all(np.diff(c) >= 0)
    q = c[np.searchsorted((c[1:] + c[:-1]) / 2.0, v)]
    err = np.abs(q - v)
    assert err.mean() / v.mean() < 4e-3
    assert err.max() < 3e4
    # Deterministic: same input -> bitwise-identical codebook.
    np.testing.assert_array_equal(c, norms.scalar_kmeans(v, 256))


def test_linscan_approx_topk_mode(rng):
    n, nq, d, m, h = 512, 4, 8, 2, 8
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbnorms = np.sum(recon * recon, axis=1).astype(np.float32)
    exact = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=10, query_chunk=4,
                            base_block=128)
    approx = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=10, query_chunk=4,
                             base_block=128, topk_method="approx:0.99")
    # High-recall approximate top-k recovers almost all of the exact set.
    overlap = np.mean([
        len(set(approx.ids[q]) & set(exact.ids[q])) / 10 for q in range(nq)
    ])
    assert overlap > 0.8


def test_linscan_select_kernel_exact(rng):
    """The fused Pallas scan+select kernel returns the exact sorted top-k
    (interpret mode off-TPU): distance parity with the streaming path and a
    brute-force oracle, valid ids, odd query counts padded correctly."""
    n, nq, d, m, h, k = 4096, 9, 8, 3, 8, 17
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    exact = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k, query_chunk=16,
                            base_block=1024)
    kern = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k, query_chunk=16,
                           base_block=1024, topk_method="kernel")
    np.testing.assert_allclose(np.asarray(kern.dists), np.asarray(exact.dists),
                               rtol=1e-4, atol=1e-4)
    ids = np.asarray(kern.ids)
    assert ids.min() >= 0 and ids.max() < n
    # Sorted ascending, and ids consistent with the reported distances.
    d_ = np.asarray(kern.dists)
    assert (np.diff(d_, axis=1) >= -1e-6).all()
    full = -2.0 * Q @ recon.T + dbn[None, :]
    np.testing.assert_allclose(np.take_along_axis(full, ids, axis=1), d_,
                               rtol=1e-4, atol=1e-4)


def test_scan_topk_warm_start_exact_and_fallback(rng):
    """Warm-started select kernel: (a) the sampled threshold path returns
    the exact sorted top-k; (b) a deliberately-undersized sample rank
    (t0 < true k-th distance) trips the exactness certificate and the
    cold-run fallback, still returning the exact result."""
    from local_search_quantization_tpu.ops.select_pallas import scan_topk_warm

    n, nq, d, m, h, k = 8192, 5, 8, 3, 8, 33
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    full = -2.0 * Q @ recon.T + dbn[None, :]
    oracle_d = np.sort(full, axis=1)[:, :k]

    for rank in (None, 1):  # None = 6-sigma sampled rank; 1 = force fallback
        dd, ii = scan_topk_warm(
            luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
            interpret=True, sample_stride=4, min_n=0, min_k=0,
            sample_rank=rank,
        )
        dd, ii = np.asarray(dd), np.asarray(ii)
        np.testing.assert_allclose(dd, oracle_d, rtol=1e-4, atol=1e-4)
        assert (np.diff(dd, axis=1) >= -1e-6).all()
        np.testing.assert_allclose(
            np.take_along_axis(full, ii, axis=1), dd, rtol=1e-4, atol=1e-4
        )

    # Deferred mode: the certificate comes back as a device flag — clear
    # for a sound sample rank, set for the deliberately-broken one.
    for rank, expect_bad in ((None, False), (1, True)):
        _, _, bad = scan_topk_warm(
            luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
            interpret=True, sample_stride=4, min_n=0, min_k=0,
            sample_rank=rank, deferred=True,
        )
        assert bool(np.asarray(bad)) == expect_bad


def test_select_kernel_unsorted_variant_matches_sorted(rng):
    """The replace-worst + final-bitonic-sort variant must return exactly
    the sorted variant's result (sorted ascending, same distances), with
    and without warm start."""
    from local_search_quantization_tpu.ops.select_pallas import (
        fused_scan_topk,
        scan_topk_warm,
    )

    n, nq, d, m, h, k = 8192, 7, 8, 3, 8, 33
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    full = -2.0 * Q @ recon.T + dbn[None, :]
    oracle = np.sort(full, axis=1)[:, :k]

    d1, _ = fused_scan_topk(luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k,
                            tb=1024, interpret=True, variant="sorted")
    d2, i2 = fused_scan_topk(luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k,
                             tb=1024, interpret=True, variant="unsorted")
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(d2), oracle, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.take_along_axis(full, np.asarray(i2), axis=1), np.asarray(d2),
        rtol=1e-4, atol=1e-4,
    )

    dw, _ = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024, interpret=True,
        sample_stride=4, min_n=0, min_k=0, variant="unsorted",
    )
    np.testing.assert_allclose(np.asarray(dw), oracle, rtol=1e-4, atol=1e-4)


def test_select_kernel_unsorted_large_k_saturating(rng):
    """Reference-depth geometry scaled down (k=10000 over 1M -> k=140 over
    8192): warm-started unsorted variant where below-threshold inserts
    EXCEED the cap-rounded buffer, so replace-worst genuinely replaces
    (not just append-fills), with an explicit small query block (the
    production large-k geometry bounds O(cap) insert passes with small
    nqt). Must stay value-exact vs the f64-graded oracle."""
    from local_search_quantization_tpu.ops.select_pallas import scan_topk_warm

    n, nq, d, m, h, k = 8192, 9, 8, 3, 8, 140
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    full = -2.0 * Q @ recon.T + dbn[None, :]
    oracle = np.sort(full, axis=1)[:, :k]
    # cap rounds to 256; sampled t0 at stride 8 admits ~rank*8 ~ 350+
    # elements, so the buffer saturates and replacement paths execute.
    dw, iw = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024, nqt=4,
        interpret=True, sample_stride=8, min_n=0, min_k=0,
        variant="unsorted",
    )
    dw, iw = np.asarray(dw), np.asarray(iw)
    np.testing.assert_allclose(dw, oracle, rtol=1e-4, atol=1e-4)
    assert (np.diff(dw, axis=1) >= -1e-6).all()
    np.testing.assert_allclose(
        np.take_along_axis(full, iw, axis=1), dw, rtol=1e-4, atol=1e-4
    )


def test_select_kernel_bf16_precision_mode(rng):
    """precision="bf16" (the hi-only serving mode) returns the EXACT
    lexicographic top-k of distances computed from bf16-ROUNDED LUTs —
    a deterministic contract, not a tolerance. Pinned against an oracle
    that rounds the same way; the rounding must actually bite (the
    rounded tables differ from f32); and the driver (_run_scan) must
    apply the same rounding on its non-kernel routes so route parity
    holds in this mode too."""
    from local_search_quantization_tpu.ops.select_pallas import (
        fused_scan_topk,
        scan_topk_warm,
    )

    n, nq, d, m, h, k = 8192, 6, 8, 3, 8, 33
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))

    # Oracle over the ROUNDED tables (f64 sums of bf16-exact values =
    # exact; kernel f32 accumulation differs by ulps, far below the
    # boundary gaps on continuous data).
    rl = np.asarray(jnp.asarray(luts).astype(jnp.bfloat16).astype(
        jnp.float32), np.float64)
    assert np.any(rl != np.asarray(luts)), "rounding must actually bite"
    full_r = rl[:, np.arange(m)[:, None], B.T].sum(1) + dbn[None, :]
    oracle_ids = np.lexsort(
        (np.broadcast_to(np.arange(n), full_r.shape), full_r), axis=1
    )[:, :k]
    oracle_d = np.take_along_axis(full_r, oracle_ids, axis=1)

    for variant in ("sorted", "grouped"):
        db, ib = fused_scan_topk(
            luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
            interpret=True, variant=variant, precision="bf16")
        np.testing.assert_array_equal(np.asarray(ib), oracle_ids)
        np.testing.assert_allclose(np.asarray(db), oracle_d,
                                   rtol=1e-5, atol=1e-5)

    # Warm path: pre-scan, threshold, certificate, and main scan all in
    # the rounded metric.
    dw, iw = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0,
        variant="grouped", precision="bf16")
    np.testing.assert_array_equal(np.asarray(iw), oracle_ids)

    # Driver routes: the streaming merge, the tournament, and the native
    # C++ scanner all scan the SAME rounded tables (luts_fn is wrapped
    # once in _run_scan, before routing), so their ids match the
    # kernel's rounded-metric oracle id-for-id.
    from local_search_quantization_tpu.utils import native as _nat

    methods = ("exact", "tournament") + (
        ("native",) if _nat.available() else ())
    for method in methods:
        res = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k,
                              query_chunk=8, base_block=1024,
                              topk_method=method, precision="bf16")
        np.testing.assert_array_equal(np.asarray(res.ids), oracle_ids)

    # f32 vs bf16 quality on continuous data: the rounded mode's top-k
    # overlaps the exact mode's almost entirely (measured recall deltas
    # live in BASELINE.md; this pins "no gross quality cliff" in CI).
    exact = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k,
                            query_chunk=8, base_block=1024,
                            topk_method="exact")
    overlap = np.mean([
        len(set(map(int, a)) & set(map(int, b))) / k
        for a, b in zip(np.asarray(exact.ids), oracle_ids)
    ])
    assert overlap >= 0.9, overlap

    with pytest.raises(ValueError, match="precision"):
        adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k, precision="fp8")


def test_select_kernel_grouped_variant_matches_sorted(rng):
    """The two-level fold-pyramid extraction (variant="grouped") must
    return exactly the sorted variant's result — cold, warm, under heavy
    exact ties (integer LUTs), and when k saturates near the buffer cap."""
    from local_search_quantization_tpu.ops.select_pallas import (
        fused_scan_topk,
        scan_topk_warm,
    )

    n, nq, d, m, h, k = 8192, 7, 8, 3, 8, 33
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    full = -2.0 * Q @ recon.T + dbn[None, :]
    oracle = np.sort(full, axis=1)[:, :k]

    for tb in (512, 1024):
        d1, _ = fused_scan_topk(luts, jnp.asarray(B.T), jnp.asarray(dbn),
                                k=k, tb=tb, interpret=True, variant="sorted")
        d2, i2 = fused_scan_topk(luts, jnp.asarray(B.T), jnp.asarray(dbn),
                                 k=k, tb=tb, interpret=True,
                                 variant="grouped")
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d1),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(d2), oracle,
                                   rtol=1e-4, atol=1e-4)
        # Returned ids must carry their own exact distances.
        np.testing.assert_allclose(
            np.take_along_axis(full, np.asarray(i2), axis=1), np.asarray(d2),
            rtol=1e-4, atol=1e-4,
        )

    dw, _ = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0, variant="grouped",
    )
    np.testing.assert_allclose(np.asarray(dw), oracle, rtol=1e-4, atol=1e-4)

    # Heavy exact ties: small-integer LUTs, zero extra term. Tie id-order
    # is part of the contract: extraction is (value, id)-lexicographic
    # (class_minima's lexicographic folds + min_arg128's abs-lane
    # tie-break), so ids must match the sorted variant EXACTLY and both
    # must match the lexicographic (dist, id) oracle — this is what keeps
    # the Pallas route, the sharded-mesh route, and the native host
    # scanner id-agreeing on tie-heavy (small-h) data.
    luts_t = jnp.asarray(
        rng.integers(0, 3, size=(nq, m, 8)).astype(np.float32)
    )
    full_t = np.asarray(luts_t)[:, np.arange(m)[:, None], B.T].sum(1)
    oracle_t = np.sort(full_t, axis=1)[:, :k]
    ids_t = np.lexsort(
        (np.broadcast_to(np.arange(n), full_t.shape), full_t), axis=1
    )[:, :k]
    dt, it = fused_scan_topk(luts_t, jnp.asarray(B.T), jnp.zeros(n), k=k,
                             tb=512, interpret=True, variant="grouped")
    ds, is_ = fused_scan_topk(luts_t, jnp.asarray(B.T), jnp.zeros(n), k=k,
                              tb=512, interpret=True, variant="sorted")
    np.testing.assert_allclose(np.asarray(dt), oracle_t, rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(it), ids_t)
    np.testing.assert_array_equal(np.asarray(is_), ids_t)
    np.testing.assert_allclose(
        np.take_along_axis(full_t, np.asarray(it), axis=1), np.asarray(dt),
        rtol=0, atol=0,
    )

    # k saturating the 128-multiple cap (cold: exercises many outer
    # pyramid rounds while the buffer fills); also the replace-worst
    # flavor with its post-kernel sort, warm and cold.
    k_big = 128
    for v in ("grouped", "grouped_unsorted"):
        d3, _ = fused_scan_topk(luts, jnp.asarray(B.T), jnp.asarray(dbn),
                                k=k_big, tb=512, interpret=True, variant=v)
        np.testing.assert_allclose(
            np.asarray(d3), np.sort(full, axis=1)[:, :k_big],
            rtol=1e-4, atol=1e-4,
        )
    dwu, _ = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0,
        variant="grouped_unsorted",
    )
    np.testing.assert_allclose(np.asarray(dwu), oracle, rtol=1e-4, atol=1e-4)


def test_select_kernel_key_variant(rng):
    """variant="key": hi-only scan + packed-monotone-key append extraction
    + exact XLA re-rank. Contract: bad=False => value-exact sorted top-k;
    an all-ties corpus must trip the certificate deterministically (the
    strict threshold extracts nothing, so d_k stays +inf)."""
    from local_search_quantization_tpu.ops.select_pallas import (
        scan_topk_warm,
    )

    n, nq, d, m, h, k = 8192, 6, 8, 3, 8, 33
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    full = -2.0 * Q @ recon.T + dbn[None, :]
    oracle = np.sort(full, axis=1)[:, :k]

    # Warm key path, deferred certificate.
    dw, iw, badw = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0, variant="key",
        deferred=True,
    )
    assert not bool(np.asarray(badw))
    np.testing.assert_allclose(np.asarray(dw), oracle, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.take_along_axis(full, np.asarray(iw), axis=1), np.asarray(dw),
        rtol=1e-4, atol=1e-4,
    )
    assert (np.diff(np.asarray(dw), axis=1) >= -1e-6).all()

    # Non-deferred wrapper resolves the certificate itself (falls back to
    # the exact path when needed) — result must be exact either way.
    dw2, _ = scan_topk_warm(
        luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0, variant="key",
    )
    np.testing.assert_allclose(np.asarray(dw2), oracle, rtol=1e-4,
                               atol=1e-4)

    # All-ties corpus: every distance identical; the strict key threshold
    # extracts nothing, the re-ranked k-th stays +inf, and the
    # certificate MUST refuse (the non-deferred wrapper then falls back
    # and still returns the exact — constant — distances).
    C0 = np.zeros((m, h, d), np.float32)
    luts0 = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C0))
    dbn0 = np.full(n, 7.0, np.float32)
    _, _, bad0 = scan_topk_warm(
        luts0, jnp.asarray(B.T), jnp.asarray(dbn0), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0, variant="key",
        deferred=True,
    )
    assert bool(np.asarray(bad0))
    d0, _ = scan_topk_warm(
        luts0, jnp.asarray(B.T), jnp.asarray(dbn0), k=k, tb=1024,
        interpret=True, sample_stride=4, min_n=0, min_k=0, variant="key",
    )
    np.testing.assert_allclose(np.asarray(d0), np.full((nq, k), 7.0),
                               rtol=1e-6, atol=1e-6)


def test_deepk_kernel_boundary_tie_widen(rng):
    """k > 2048 routes to the grouped_unsorted kernel, whose value-strict
    threshold is arrival-biased about WHICH tie-mates survive the k-th-
    value boundary. The two-phase widen (VERDICT r3 item 5) must restore
    the exact lexicographic contract: _run_scan requests k+1 columns,
    d[k-1] < d[k] certifies no boundary tie-mate was skipped, and tied
    queries rerun through the lex-exact grouped sorted kernel. Tie-heavy
    duplicated codes at h=4 make the boundary tie block hundreds wide, so
    without the widen this fails with near-certainty."""
    n, nq, d, m, h, k = 6000, 3, 8, 2, 4, 2100
    C_sub = jnp.asarray(rng.normal(size=(m, h, d // m)).astype(np.float32))
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    B[n // 2:] = B[: n - n // 2]  # massive exact ties
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    res = adc.linscan_pq(B, Q, C_sub, k=k, topk_method="kernel")
    luts = np.asarray(adc.pq_query_luts(jnp.asarray(Q), C_sub))
    full = luts[:, np.arange(m)[:, None], B.T].sum(1)
    ids_lex = np.lexsort(
        (np.broadcast_to(np.arange(n), full.shape), full), axis=1
    )[:, :k]
    # The kernel's hi/lo-split distances are f32-grade but not bitwise
    # numpy f32 sums; the ID set under ties is still pinned exactly
    # because whole tie blocks share one LUT-entry sum in both
    # arithmetics (small-integer-free but exactly-duplicated gathers).
    np.testing.assert_array_equal(np.asarray(res.ids), ids_lex)
    np.testing.assert_allclose(
        np.asarray(res.dists),
        np.take_along_axis(full, ids_lex, axis=1), rtol=1e-4, atol=1e-4)


def test_linscan_base_segmentation_matches_whole(rng):
    """Host-side base segmentation (the >HBM streaming path) must return
    exactly the whole-base result, ids globally offset."""
    n, nq, d, m, h, k = 3000, 4, 8, 2, 8, 11
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbn = np.sum(recon * recon, axis=1).astype(np.float32)
    whole = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k, query_chunk=4,
                            base_block=256)
    seg = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn, k=k, query_chunk=4,
                          base_block=256, base_segment=1024)
    np.testing.assert_allclose(np.asarray(seg.dists), np.asarray(whole.dists),
                               rtol=1e-5, atol=1e-5)
    assert np.asarray(seg.ids).min() >= 0 and np.asarray(seg.ids).max() < n


def test_select_kernel_non_lane_aligned_h(rng):
    """h not a multiple of the 128-lane width must pad transparently in
    the select kernel (codes never reach padded LUT columns)."""
    from local_search_quantization_tpu.ops.select_pallas import fused_scan_topk

    for h in (20, 200):
        n, nq, d, m, k = 2048, 3, 8, 3, 9
        C = (rng.normal(size=(m, h, d))).astype(np.float32)
        B = rng.integers(0, h, size=(n, m), dtype=np.int32)
        Q = rng.normal(size=(nq, d)).astype(np.float32)
        recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
        dbn = np.sum(recon * recon, axis=1).astype(np.float32)
        luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
        dd, ii = fused_scan_topk(
            luts, jnp.asarray(B.T), jnp.asarray(dbn), k=k, tb=512,
            interpret=True,
        )
        full = -2.0 * Q @ recon.T + dbn[None, :]
        oracle = np.sort(full, axis=1)[:, :k]
        np.testing.assert_allclose(np.asarray(dd), oracle, rtol=1e-4,
                                   atol=1e-4)
        assert np.asarray(ii).max() < n


def test_linscan_tournament_exactly_matches_streaming(rng, monkeypatch):
    """The group-minima tournament is EXACT: identical distances to the
    streaming lax.top_k path, in both stash-the-tiles and O(1)-memory
    recompute modes."""
    n, nq, d, m, h = 4096, 6, 8, 3, 8
    C = (rng.normal(size=(m, h, d))).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    recon = np.asarray(costs.reconstruct(jnp.asarray(B), jnp.asarray(C)))
    dbnorms = np.sum(recon * recon, axis=1).astype(np.float32)
    k = 17
    exact = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=k, query_chunk=8,
                            base_block=1024)
    two = adc.linscan_lsq(B, Q, jnp.asarray(C), dbnorms, k=k, query_chunk=8,
                          base_block=1024, topk_method="tournament")
    np.testing.assert_allclose(np.asarray(two.dists), np.asarray(exact.dists),
                               rtol=1e-5, atol=1e-5)
    # Certified lex contract: both routes see bitwise-identical block
    # distances (same lut_scan_block), and the tournament's certify/rerun
    # phase makes its boundary survival exactly (dist, id)-lexicographic
    # — so the ids must MATCH the streaming merge id-for-id, ties or not.
    np.testing.assert_array_equal(np.asarray(two.ids), np.asarray(exact.ids))

    # Recompute mode (no [nq, n] stash): same result, including the norms
    # `extra` term re-added during candidate recomputation.
    luts = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C))
    rec = adc._scan_topk_tournament(
        luts, jnp.asarray(B.T), jnp.asarray(dbnorms), k, 1024,
        store_dists=False,
    )
    np.testing.assert_allclose(np.asarray(rec.dists),
                               np.asarray(exact.dists)[:nq],
                               rtol=1e-5, atol=1e-5)

    # Brute-force distance oracle (ids may swap on fp near-ties at the k-th
    # boundary; the value multiset is the exactness contract).
    full = -2.0 * Q @ recon.T + dbnorms[None, :]
    oracle_d = np.sort(full, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(two.dists), oracle_d,
                               rtol=1e-4, atol=1e-4)

    # Certified recompute mode end-to-end (LSQ_TPU_TOPK_STORE=0 forces
    # the O(1)-memory route through _run_scan): the cross-metric
    # certificate's summand-magnitude slack (advisor r4 fix) must flag
    # boundary ties without being poisoned by +inf tombstone entries in
    # `extra` (an inf-scaled slack would flag EVERY query and rerun the
    # whole batch), and the rerouted results must still match the
    # streaming merge id-for-id.
    monkeypatch.setenv("LSQ_TPU_TOPK_STORE", "0")
    dbn_t = dbnorms.copy()
    dbn_t[:7] = np.inf  # tombstones ride the extra term
    ex_t = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn_t, k=k, query_chunk=8,
                           base_block=1024)
    rc_t = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn_t, k=k, query_chunk=8,
                           base_block=1024, topk_method="tournament")
    np.testing.assert_array_equal(np.asarray(rc_t.ids), np.asarray(ex_t.ids))
    assert not np.isin(np.arange(7), np.asarray(rc_t.ids)).any()
    _, tied = adc._scan_topk_tournament(
        luts, jnp.asarray(B.T), jnp.asarray(dbn_t), k, 1024,
        store_dists=False, certify=True)
    # h=8, m=3 gives only 512 distinct code rows over n=4096: every query
    # boundary sits inside a genuine tie block, so flagging ALL is the
    # CORRECT behavior here (and the id-parity assert above proves the
    # rerun restores exactness).
    assert bool(np.asarray(tied).all())
    # Poisoning check needs distance-distinct data (h=32 -> 32k distinct
    # rows): margins near the boundary are then orders of magnitude
    # larger than the cross-metric slack, so an all-flagged result could
    # only come from an inf-poisoned scale (the bug this guards).
    h2 = 32
    C2 = (rng.normal(size=(m, h2, d))).astype(np.float32)
    B2 = rng.integers(0, h2, size=(n, m), dtype=np.int32)
    recon2 = np.asarray(costs.reconstruct(jnp.asarray(B2), jnp.asarray(C2)))
    dbn2 = np.sum(recon2 * recon2, axis=1).astype(np.float32)
    dbn2[:7] = np.inf
    luts2 = adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C2))
    _, tied2 = adc._scan_topk_tournament(
        luts2, jnp.asarray(B2.T), jnp.asarray(dbn2), k, 1024,
        store_dists=False, certify=True)
    assert not bool(np.asarray(tied2).any()), (
        "distinct-distance data flagged tied — the certificate slack "
        "scale is poisoned (|inf| extra?)")


@pytest.mark.parametrize("method",
                         ["tournament", "exact", "approx", "native"])
def test_scan_sentinel_contract(rng, method):
    """Every scan path shares the (+inf, -1) sentinel contract: none may
    return tombstoned rows' real ids at +inf distance (regression: the
    tournament path violated this, and refine.rerank converted such ids
    back into finite-distance results, resurrecting deletes). The exact
    streaming merge preserves -1 only through top_k's prefer-lower-index
    tie rule + the carry-first concat order — this pins that too."""
    from local_search_quantization_tpu.utils import native as nat

    if method == "native" and not nat.available():
        pytest.skip("native library not built")
    n, d, m, h = 600, 16, 2, 16
    C_sub = (rng.normal(size=(m, h, d // m)) * 5).astype(np.float32)
    B = rng.integers(0, h, size=(n, m)).astype(np.int32)
    Q = rng.normal(size=(4, d)).astype(np.float32) * 5
    extra = np.zeros(n, np.float32)
    extra[10:] = np.inf  # tombstone all but 10 rows
    res = adc.linscan_pq(B, Q, C_sub, k=40, extra=extra,
                         topk_method=method)
    dists, ids = np.asarray(res.dists), np.asarray(res.ids)
    assert np.isfinite(dists[:, :10]).all()
    assert (ids[:, :10] < 10).all() and (ids[:, :10] >= 0).all()
    assert np.isinf(dists[:, 10:]).all()
    assert (ids[:, 10:] == -1).all(), ids[:, 10:]


def test_select_geometry_defaults(monkeypatch):
    """select_geometry is the single source of the kernel's default
    (variant, tb, nqt) for both query routes (ops/adc._run_scan and
    parallel/query.sharded_scan_topk). Pins the measured-optimal round-3
    sweep outcome (BASELINE.md "grouped variant" section) and the env
    override + tiny-base tb capping contracts."""
    from local_search_quantization_tpu.ops.select_pallas import (
        select_geometry,
    )

    for var in ("LSQ_TPU_SELECT_VARIANT", "LSQ_TPU_SELECT_TB",
                "LSQ_TPU_SELECT_NQT"):
        monkeypatch.delenv(var, raising=False)
    assert select_geometry(1000) == ("grouped", 8192, None)
    assert select_geometry(2048) == ("grouped", 8192, None)
    assert select_geometry(2049) == ("grouped_unsorted", 8192, 256)
    assert select_geometry(10000) == ("grouped_unsorted", 8192, 256)
    # Tiny bases cap tb (interpret-mode tests should not pad 100 rows to
    # 8192) but never below the 128-lane minimum, and keep power-of-two.
    assert select_geometry(10, n=100) == ("grouped", 256, None)
    assert select_geometry(10, n=5000) == ("grouped", 8192, None)
    v, tb, _ = select_geometry(10, n=1)
    assert tb == 256 and (tb & (tb - 1)) == 0
    # Code-width rules (measured, BASELINE.md 128-bit section): tb=8192
    # wins through m*h=4096 (the bf16 one-hot tile still fits; the auto
    # query block steps down instead); only wider LUTs (h=512 wide codes)
    # halve the tile. Deep-k wide geometries step nqt 256 -> 128 (the
    # 64-bit nqt=256 default is a measured OOM at m*h=4096/tb=8192).
    assert select_geometry(1000, mh=1792) == ("grouped", 8192, None)
    assert select_geometry(1000, mh=2048) == ("grouped", 8192, None)
    assert select_geometry(1000, mh=3840) == ("grouped", 8192, None)
    assert select_geometry(1000, mh=4096) == ("grouped", 8192, None)
    # mh=8192 (m=16 at h=512): tb=4096 is MEASURED-optimal on-chip
    # (round-5 wide-LUT row: 3,485 qps warm vs 3,372 at tb=2048 and an
    # OOM at tb=8192) — the 70 MB tile rule lands exactly there, with
    # the kernel's auto-nqt guard stepping the query block down.
    assert select_geometry(1000, mh=8192) == ("grouped", 4096, None)
    assert select_geometry(1000, m=16, h=512) == ("grouped", 4096, None)
    assert select_geometry(1000, m=15, h=512) == ("grouped", 4096, None)
    assert select_geometry(1000, mh=4608) == ("grouped", 4096, None)
    assert select_geometry(10000, mh=1792) == ("grouped_unsorted", 8192, 256)
    assert select_geometry(10000, mh=4096) == ("grouped_unsorted", 8192, 128)
    # The (m, h) form applies the kernel's 128-lane h padding itself —
    # the form both query routes use, so their VMEM model can't diverge
    # from the kernel's allocation; mixing forms is an error.
    assert select_geometry(1000, m=7, h=256) == select_geometry(1000, mh=1792)
    assert select_geometry(10000, m=16, h=256) == select_geometry(
        10000, mh=4096)
    assert select_geometry(1000, m=7, h=20) == select_geometry(1000, mh=896)
    with pytest.raises(ValueError, match="together"):
        select_geometry(1000, mh=1792, m=7, h=256)
    with pytest.raises(ValueError, match="together"):
        select_geometry(1000, m=7)
    # Env overrides (tuning sweeps) win over the measured defaults.
    monkeypatch.setenv("LSQ_TPU_SELECT_VARIANT", "sorted")
    monkeypatch.setenv("LSQ_TPU_SELECT_TB", "2048")
    monkeypatch.setenv("LSQ_TPU_SELECT_NQT", "512")
    assert select_geometry(1000) == ("sorted", 2048, 512)
    # The grouped fold pyramid needs a power-of-two tb >= 128: both bad
    # shapes must fail at the env boundary with the remedy, not in-kernel.
    monkeypatch.setenv("LSQ_TPU_SELECT_VARIANT", "grouped")
    monkeypatch.setenv("LSQ_TPU_SELECT_TB", "3000")
    with pytest.raises(ValueError, match="power of two"):
        select_geometry(1000)
    monkeypatch.setenv("LSQ_TPU_SELECT_TB", "64")
    with pytest.raises(ValueError, match="power of two"):
        select_geometry(1000)


def test_pad_rerun_idx_buckets_shapes():
    """Every tie-rerun site feeds a data-dependent number of tied queries
    into a jitted scan; pad_rerun_idx must bucket that leading dim to a
    power of two >= 8 (each DISTINCT count would otherwise be a fresh
    multi-minute remote compile) while keeping the original indices as a
    prefix so callers can scatter back the first len(tq) rows."""
    for count in (1, 2, 7, 8, 9, 129, 1000):
        tq = np.arange(count, dtype=np.int64) * 3
        p = adc.pad_rerun_idx(tq)
        assert len(p) >= max(8, count)
        assert (len(p) & (len(p) - 1)) == 0  # power of two
        np.testing.assert_array_equal(p[:count], tq)
        assert (p[count:] == tq[0]).all()  # pads are a real, valid query
    # Empty input has no first index to pad with; the precondition is an
    # explicit error, not an IndexError (callers gate on tied.any()).
    with pytest.raises(ValueError, match="nonempty"):
        adc.pad_rerun_idx(np.empty(0, np.int64))


def test_run_scan_device_state_matches_fresh_upload(rng):
    """prepare_device_codes + device_state (the serving-side code cache,
    Index._device_scan_state) must be result-identical to the per-call
    upload on both the streaming and kernel routes, and a state built for
    a different base/base_block must be rejected, not silently scanned."""
    n, nq, d, m, h = 1000, 6, 8, 2, 8
    C_sub = (rng.normal(size=(m, h, d // m)) * 0.5).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    Q = rng.normal(size=(nq, d)).astype(np.float32)
    state = adc.prepare_device_codes(B, None, base_block=256)
    assert state[0].shape == (m, 1024)  # padded to the block multiple
    assert bool(jnp.isinf(state[1][n:]).all())  # pads can never win
    for method in ("exact", "kernel"):
        fresh = adc.linscan_pq(B, Q, C_sub, k=10, topk_method=method,
                               base_block=256)
        cached = adc.linscan_pq(B, Q, C_sub, k=10, topk_method=method,
                                base_block=256, device_state=state)
        np.testing.assert_array_equal(np.asarray(cached.ids),
                                      np.asarray(fresh.ids))
        np.testing.assert_array_equal(np.asarray(cached.dists),
                                      np.asarray(fresh.dists))
    with pytest.raises(ValueError, match="device_state"):
        adc.linscan_pq(B, Q, C_sub, k=10, base_block=384,
                       device_state=state)
    with pytest.raises(ValueError, match="device_state"):
        adc.linscan_pq(B[:700], Q, C_sub, k=10, base_block=256,
                       device_state=state)


def test_quantize_norms_chunked_matches_single_launch(rng):
    """quantize_norms row-chunking (the [n*m, d] reconstruction
    intermediate is a measured 27 GB HBM OOM at the GIST paper-scale
    shape) must be code-identical to the single-launch path, including
    a padded final block."""
    n, d, m, h = 1000, 12, 3, 16
    C = (rng.normal(size=(m, h, d)) * 0.5).astype(np.float32)
    B = jnp.asarray(rng.integers(0, h, size=(n, m), dtype=np.int32))
    cb = jnp.asarray(np.sort(rng.random(h)).astype(np.float32) * 50.0)
    whole = np.asarray(norms.quantize_norms(B, jnp.asarray(C), cb))
    chunked = np.asarray(norms.quantize_norms(B, jnp.asarray(C), cb,
                                              block=256))
    np.testing.assert_array_equal(chunked, whole)

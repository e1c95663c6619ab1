"""On-hardware contract smoke: the per-toolchain regression gate.

Asserts, on the REAL chip, the one class of behavior no CPU/interpret test
can see: numerical contracts that depend on how the TPU toolchain compiles
the kernels. The flagship hazard is excess-precision folding of hi/lo bf16
splits — this terminal compiles with --xla_allow_excess_precision=true,
which once silently degraded every "f32-grade" distance to plain bf16 ON
TPU ONLY (found at 5.3e-3 relative ADC error where ~1e-5 was claimed;
BASELINE.md "Precision audit"). The fix is barrier-guarded code
(ops/select_pallas._split_hi_lo / round_bf16) — this script is the
committed artifact that RE-VERIFIES the numbers on hardware, so a
toolchain/compiler bump cannot regress the contract family undetected.

Four checks (VERDICT r4 item 1), one process, compile-light (reuses the
production shape families):

  a. hi/lo materialization, select path: the fused scan+select kernel's
     ADC distances vs an f64 oracle over the same device LUTs — max rel
     error <= 5e-5 (measured 0.8-1.2e-5 healthy; ~5e-3 broken), plus a
     tolerance-banded ranking check and the warm certificate holding.
  b. hi/lo materialization, encode path: the whole-ILS kernel's in-kernel
     accept cost vs an exact f64 recompute of ||x - recon||^2 — max rel
     <= 5e-5 (measured ~8.7e-7 healthy; ~4e-3 broken) — and kernel vs
     XLA-gather encode mean-cost parity <= 1% from the same start
     (BASELINE.md: 52.89 vs 52.97 on 131k vectors), both accept-monotone.
  c. deep-k two-phase widen on a tie-planted base (64 distinct code rows
     -> every k boundary sits inside a massive tie block): the
     certificate must FIRE (counted via the rerun hook) and the final
     ids must equal the stable-argsort lexicographic oracle id-for-id.
  d. bf16 rounded-metric serving mode: ids equal the f64 oracle over the
     ROUNDED tables id-for-id, kernel distances match that oracle to f32
     accumulation (<= 1e-5 rel), and the rounded metric measurably
     differs from f32 (> 1e-6 rel somewhere) — if round_bf16's barrier
     regressed (tables silently un-rounded), the distance check fails by
     ~2e-3.

Emits ONE JSON line; --out writes the same object as the committed
artifact (TPUSMOKE_r05.json). Run: `python scripts/tpu_smoke.py --out
TPUSMOKE_r05.json` (defaults target the real chip; --platform cpu +
--small exists so the suite can exercise the script's own logic in
interpret mode, where the hazard cannot appear but the checks must pass).

Reference analog: none — /root/reference has no tests at all (SURVEY §4);
this gate is the promised do-better on the only class CPU tests miss.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import _bootstrap  # noqa: F401  (repo-root sys.path shim)

import numpy as np


def _lex_argsort(full: np.ndarray, k: int) -> np.ndarray:
    """Exact (dist, id)-lexicographic top-k ids per row: a stable argsort
    over the id axis IS the lexsort (the index being the id)."""
    return np.argsort(full, axis=1, kind="stable")[:, :k]


def _full_dists(luts64: np.ndarray, B: np.ndarray,
                dbn64: np.ndarray) -> np.ndarray:
    """f64 oracle distance matrix [nq, n] from device-f32 LUTs: the oracle
    shares the LUT build with the kernel (so it isolates the SCAN path's
    precision), summing in f64 what the kernel sums via hi/lo matmuls."""
    nq = luts64.shape[0]
    n, m = B.shape
    full = np.broadcast_to(dbn64[None, :], (nq, n)).copy()
    for i in range(m):
        full += luts64[:, i, :][:, B[:, i]]
    return full


def _dists_at(luts64, B, dbn64, ids):
    """f64 oracle distances at specific candidate ids ([nq, k])."""
    nq, k = ids.shape
    m = B.shape[1]
    out = dbn64[ids.reshape(-1)].reshape(nq, k)
    q = np.arange(nq)[:, None]
    for i in range(m):
        out += luts64[q, i, B[ids, i]]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (default: process default — "
                         "the real TPU under axon)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for suite-speed interpret runs")
    ap.add_argument("--out", default=None, help="write the JSON artifact")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from local_search_quantization_tpu.ops import adc
    from local_search_quantization_tpu.ops.icm import ils_encode
    from local_search_quantization_tpu.ops.select_pallas import (
        scan_topk_warm, select_geometry,
    )

    platform = jax.devices()[0].platform
    t_start = time.perf_counter()
    res: dict = {"platform": platform, "checks": {}}
    rng = np.random.default_rng(0)

    if args.small:
        n, nq, d, m, h = 16384, 8, 32, 4, 64
        k_sel, k_deep = 600, 2100
        n_ils, ils_rounds = 2048, 2
    else:
        n, nq, d, m, h = 1 << 17, 256, 128, 7, 256
        k_sel, k_deep = 1000, 10000
        n_ils, ils_rounds = 1 << 15, 2

    # ---- shared model/query fixtures (SIFT-like magnitudes) -------------
    Q = rng.normal(size=(nq, d)).astype(np.float32) * 30.0
    C = (rng.normal(size=(m, h, d)) * 12.0).astype(np.float32)
    B = rng.integers(0, h, size=(n, m), dtype=np.int32)
    C64 = C.astype(np.float64)
    recon = np.zeros((n, d), np.float64)
    for i in range(m):
        recon += C64[i, B[:, i]]
    dbn = np.sum(recon * recon, axis=1)
    dbn32 = dbn.astype(np.float32)

    luts_dev = np.asarray(adc.lsq_query_luts(jnp.asarray(Q), jnp.asarray(C)),
                          np.float32)
    luts64 = luts_dev.astype(np.float64)
    dbn64 = dbn32.astype(np.float64)  # the f32 values the kernel adds
    # Error scale for relative checks: the scan's rounding error is
    # proportional to the SUMMAND magnitudes (m LUT entries + the norm
    # term), not to the possibly-cancelled sum — a near-zero distance
    # must not blow up an honest ~1e-5-of-scale error into a failure.
    qscale = (np.abs(luts64).max(axis=2).sum(axis=1)
              + np.abs(dbn64).max())[:, None]  # [nq, 1]

    # ---- check a: select-kernel hi/lo precision + warm certificate ------
    t0 = time.perf_counter()
    out = adc.linscan_lsq(B, Q, jnp.asarray(C), dbn32, k=k_sel,
                          topk_method="kernel")
    d_np, i_np = np.asarray(out.dists), np.asarray(out.ids)
    at = _dists_at(luts64, B, dbn64, i_np)
    scale = np.maximum(np.abs(at), qscale)
    rel_sel = float(np.max(np.abs(d_np - at) / scale))
    full64 = _full_dists(luts64, B, dbn64)
    kth = np.sort(full64, axis=1)[:, k_sel - 1]
    band = (5e-5 * np.maximum(np.abs(kth)[:, None], qscale))[:, 0]
    # Every returned id must be within the oracle band of the k-th value,
    # and every id strictly below the band must be returned (exact-set
    # check with an f32-accumulation tolerance at the boundary).
    ok_member = at <= (kth + band)[:, None]
    must = full64 < (kth - band)[:, None]
    got = np.zeros_like(must)
    np.put_along_axis(got, i_np, True, axis=1)
    missing = int(np.sum(must & ~got))
    # Warm-start certificate on the same compiled family: the sampled
    # bound must certify (bad == False) on continuous data.
    bad = None
    variant, tb, nqt = select_geometry(k_sel, n=n, m=m, h=h)
    pad = (-n) % (1 << 16)
    Bt_j = jnp.asarray(
        np.ascontiguousarray(np.concatenate(
            [B, np.zeros((pad, m), B.dtype)]).T))
    ex_j = jnp.asarray(np.concatenate(
        [dbn32, np.full(pad, np.inf, np.float32)]))
    _, _, bad_dev = scan_topk_warm(
        jnp.asarray(luts_dev), Bt_j, ex_j, k=k_sel, tb=tb, nqt=nqt,
        interpret=platform != "tpu", deferred=True, variant=variant)
    bad = None if bad_dev is None else bool(np.asarray(bad_dev))
    res["checks"]["select_hi_lo"] = {
        "max_rel_err": rel_sel,
        "claim": 5e-5,
        "band_violations": int(np.sum(~ok_member)),
        "missing_below_band": missing,
        "warm_certificate_ok": (bad is None) or (not bad),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    assert rel_sel <= 5e-5, (
        f"select hi/lo split degraded: {rel_sel:.2e} rel vs f64 oracle "
        "(healthy ~1e-5, excess-precision-folded ~5e-3 — check "
        "_split_hi_lo's optimization_barrier against the toolchain)")
    assert int(np.sum(~ok_member)) == 0 and missing == 0
    assert bad is None or not bad, "warm certificate failed on continuous data"

    # ---- check b: ILS kernel accept-cost precision + mode parity --------
    t0 = time.perf_counter()
    X_ils = rng.integers(0, 256, size=(n_ils, d)).astype(np.float32)
    C_ils = (rng.normal(size=(m, h, d)) * 36.0).astype(np.float32)
    B0 = rng.integers(0, h, size=(n_ils, m), dtype=np.int32)
    key = jax.random.PRNGKey(0)
    C_ils64 = C_ils.astype(np.float64)
    X64 = X_ils.astype(np.float64)

    def exact_cost(Bc):
        r = np.zeros((n_ils, d), np.float64)
        for i in range(m):
            r += C_ils64[i, Bc[:, i]]
        diff = r - X64
        return np.sum(diff * diff, axis=1)

    cost0 = exact_cost(B0)
    stats = {}
    for cmode in ("kernel", "gather"):
        r = ils_encode(key, jnp.asarray(X_ils), jnp.asarray(B0),
                       jnp.asarray(C_ils), ilsiter=ils_rounds, icmiter=4,
                       npert=4, condition_mode=cmode)
        c_dev = np.asarray(r.cost, np.float64)
        c_exact = exact_cost(np.asarray(r.B))
        rel = np.abs(c_dev - c_exact) / np.maximum(c_exact, 1.0)
        assert (c_exact <= cost0 + 1e-3).all(), (
            f"accept-if-better violated on hardware (mode={cmode})")
        stats[cmode] = {"max_rel_err": float(rel.max()),
                        "mean_rel_err": float(rel.mean()),
                        "mean_cost": float(c_exact.mean())}
    rel_ils = stats["kernel"]["max_rel_err"]
    mk, mg = stats["kernel"]["mean_cost"], stats["gather"]["mean_cost"]
    parity = abs(mk - mg) / mg
    res["checks"]["ils_hi_lo"] = {
        **stats["kernel"], "claim": 5e-5,
        "gather_mean_cost": mg, "mode_parity_rel": parity,
        "cost0_mean": float(cost0.mean()),
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    assert rel_ils <= 5e-5, (
        f"ILS accept-cost hi/lo split degraded: {rel_ils:.2e} rel "
        "(healthy ~1e-6, folded ~4e-3 — check _mrf_cost's barrier)")
    assert parity <= 0.01, (
        f"kernel vs gather encode quality diverged: {mk:.2f} vs {mg:.2f}")

    # ---- checks c/d: tie-planted base ----------------------------------
    n_dist = 64
    proto = rng.integers(0, h, size=(n_dist, m), dtype=np.int32)
    assign = rng.integers(0, n_dist, size=n, dtype=np.int64)
    B_t = proto[assign]
    recon_p = np.zeros((n_dist, d), np.float64)
    for i in range(m):
        recon_p += C64[i, proto[:, i]]
    dbn_p = np.sum(recon_p * recon_p, axis=1).astype(np.float32)
    dbn_t = dbn_p[assign]
    full_t = _full_dists(luts64, B_t, dbn_t.astype(np.float64))

    # c: deep-k widen must fire and restore the lexicographic oracle.
    t0 = time.perf_counter()
    calls = {"n": 0}
    orig_pad = adc.pad_rerun_idx

    def counting_pad(tq):
        calls["n"] += 1
        return orig_pad(tq)

    adc.pad_rerun_idx = counting_pad
    try:
        out_t = adc.linscan_lsq(B_t, Q, jnp.asarray(C), dbn_t, k=k_deep,
                                topk_method="kernel")
    finally:
        adc.pad_rerun_idx = orig_pad
    oracle_ids = _lex_argsort(full_t, k_deep)
    deep_ok = bool(np.array_equal(np.asarray(out_t.ids), oracle_ids))
    res["checks"]["deepk_tie_widen"] = {
        "widen_fired": calls["n"] > 0,
        "rerun_calls": calls["n"],
        "id_parity": deep_ok,
        "k": k_deep,
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    assert calls["n"] > 0, (
        "tie-planted batch did not trigger the deep-k widen — the "
        "certificate is not firing")
    assert deep_ok, "deep-k widen output != lexicographic oracle"

    # d: bf16 rounded-metric id parity + the rounding actually biting.
    t0 = time.perf_counter()
    import ml_dtypes

    luts_r64 = luts_dev.astype(ml_dtypes.bfloat16).astype(np.float64)
    assert np.any(luts_r64 != luts64), "bf16 rounding must bite the tables"
    full_r = _full_dists(luts_r64, B_t, dbn_t.astype(np.float64))
    out_b = adc.linscan_lsq(B_t, Q, jnp.asarray(C), dbn_t, k=k_sel,
                            topk_method="kernel", precision="bf16")
    ids_b = np.asarray(out_b.ids)
    oracle_b = _lex_argsort(full_r, k_sel)
    bf16_ids_ok = bool(np.array_equal(ids_b, oracle_b))
    at_r = _dists_at(luts_r64, B_t, dbn_t.astype(np.float64), ids_b)
    sc = np.maximum(np.abs(at_r), qscale)
    rel_b = float(np.max(np.abs(np.asarray(out_b.dists) - at_r) / sc))
    at_f = _dists_at(luts64, B_t, dbn_t.astype(np.float64), ids_b)
    metric_gap = float(np.max(np.abs(at_r - at_f) / sc))
    res["checks"]["bf16_rounded_metric"] = {
        "id_parity": bf16_ids_ok,
        "max_rel_err_vs_rounded_oracle": rel_b,
        "claim": 1e-5,
        "rounded_vs_f32_metric_gap": metric_gap,
        "wall_s": round(time.perf_counter() - t0, 2),
    }
    assert bf16_ids_ok, "bf16 route ids != rounded-table oracle"
    assert rel_b <= 1e-5, (
        f"bf16 route distances off the rounded metric by {rel_b:.2e} — "
        "round_bf16's barrier may have regressed (un-rounded tables "
        "show ~2e-3 here)")
    assert metric_gap > 1e-6, (
        "rounded and f32 metrics indistinguishable — fixture too easy "
        "to detect un-rounding")

    res["ok"] = True
    res["wall_s"] = round(time.perf_counter() - t_start, 2)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return res


if __name__ == "__main__":
    try:
        main()
    except AssertionError as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        sys.exit(1)

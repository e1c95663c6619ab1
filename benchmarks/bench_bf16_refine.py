#!/usr/bin/env python
"""Measure the recommended serving pairing: bf16 scan + exact f32 refine.

BASELINE.md recommends "bf16 candidates + refine exact rerank" for
quality-critical serving but (VERDICT r4 item 2) never measured that
composition. This pins qps + TRUE-NN recall at 1M scale for the full
grid: {f32, bf16} x {refine off, refine 4} x k in {10, 100}, one table.

Two phases so the TPU only ever runs the measurement (one-TPU-process
box; training/corpus prep are CPU work):

  --prep:    CPU. Generate the corpus (synthetic v5, d=128, exact gt),
             build the PQ m=8 h=256 index with an SQ8 refine store, save
             both under --cache.
  (measure): load the prepared index + corpus, run the grid on the
             default backend (the real chip), write --out.

qps methodology: one Index.search call takes the whole query set (the
select kernel blocks internally — the nq-scaling law is free); best of
--trials timed calls after a warm call, timed via the host fetch the
call already performs. The refine stage reranks on host from the SQ8
store (gather + exact f32 distances over nq*refine*k candidates).
True-NN recall = fraction of queries whose EXACT nearest base row (the
corpus ground truth) appears in the top-N returned ids — the number a
serving user cares about, not the ADC-surrogate self-recall.

Reference analog: the serving op is linscan_aqd.cpp:37-102; the
reference has no refine stage and no bf16 mode (f32-only LUTs at :66-74).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import _bootstrap  # noqa: F401

import numpy as np


def _corpus(cache: str, n: int, ntrain: int, nq: int):
    path = os.path.join(cache, f"corpus_{n}_{ntrain}_{nq}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["train"], z["base"], z["query"], z["gt"]
    from local_search_quantization_tpu.utils.synth import synthetic_dataset

    dd = synthetic_dataset(0, d=128, n_train=ntrain, n_base=n, n_query=nq)
    os.makedirs(cache, exist_ok=True)
    np.savez(path, train=dd.train, base=dd.base, query=dd.query, gt=dd.gt)
    return dd.train, dd.base, dd.query, dd.gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default=".cache/bf16_refine")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--ntrain", type=int, default=100_000)
    ap.add_argument("--nq", type=int, default=8192)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--method", default="pq", choices=("pq", "lsq"),
                    help="index family: pq (m=8) or the flagship additive "
                         "lsq (m=7 + norm byte) — same 64-bit budget")
    ap.add_argument("--prep", action="store_true",
                    help="build corpus + index + refine store (CPU by "
                         "default; pass --platform default to build on "
                         "the process backend — the chip — for methods "
                         "whose 1M encode needs it, e.g. lsq)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="serving_refine_1m.json")
    args = ap.parse_args()

    import jax

    # --platform default = leave the process backend alone (under the
    # axon runtime the TPU platform is not addressable by the name "tpu"
    # in jax_platforms, so "run on the chip" means "don't touch it").
    if args.platform and args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    if args.prep and args.platform is None:
        jax.config.update("jax_platforms", "cpu")

    from local_search_quantization_tpu.index import Index

    idx_dir = os.path.join(args.cache, f"idx_{args.method}_{args.n}")
    train, base, query, gt = _corpus(args.cache, args.n, args.ntrain,
                                     args.nq)

    if args.prep:
        t0 = time.time()
        idx = Index.build(train, base, args.method, h=256, niter=10,
                          seed=0, refine="sq8")
        idx.save(idx_dir)
        print(f"[prep] built + saved {idx_dir} in {time.time() - t0:.0f}s "
              f"(n={idx.n}, refine={idx.refine.kind})")
        return

    idx = Index.load(idx_dir)
    assert idx.refine is not None, "run --prep first (refine store missing)"
    Q = query.astype(np.float32)
    platform = jax.devices()[0].platform
    print(f"[bench] n={idx.n} nq={args.nq} platform={platform}; grid = "
          f"precision x refine x k", file=sys.stderr)

    rows = []
    for precision in ("f32", "bf16"):
        for refine in (0, 4):
            for k in (10, 100):
                kw = dict(k=k, precision=precision,
                          refine=refine or None)
                res = idx.search(Q, **kw)  # warm: compile + code upload
                ids = np.asarray(res.ids)  # recall from the UNROLLED set
                best = float("inf")
                for t in range(args.trials):
                    # Distinct query bytes per trial: identical repeated
                    # dispatches may be served from a remote cache on
                    # this backend (CLAUDE.md). A row roll preserves the
                    # distribution and shapes, so qps is comparable.
                    Qv = np.roll(Q, t + 1, axis=0)
                    t0 = time.perf_counter()
                    idx.search(Qv, **kw)
                    best = min(best, time.perf_counter() - t0)
                hit = ids == gt[:, None]
                r1 = float(hit[:, :1].any(axis=1).mean())
                r10 = float(hit[:, :min(10, k)].any(axis=1).mean())
                row = {"precision": precision, "refine": refine, "k": k,
                       "qps": round(args.nq / best, 1),
                       "true_r@1": round(r1, 4), "true_r@10": round(r10, 4)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    out = {"n": idx.n, "nq": args.nq,
           "method": f"{args.method}-h256",
           "platform": platform, "trials": args.trials, "rows": rows,
           "note": "end-to-end Index.search incl. host fetch; true-NN "
                   "recall vs exact corpus gt"}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[bench] wrote {args.out}")


if __name__ == "__main__":
    main()

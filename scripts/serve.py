#!/usr/bin/env python
"""Serve k-NN queries over an index built by scripts/build_index.py.

JSON-lines protocol on stdin/stdout. First output line announces
readiness (after the warm-up batch has compiled the query program):

    {"ready": true, "method": "lsq", "n": 1000000, "k": 100}

then one response per request line:

    request:  {"id": 7, "vectors": [[...d floats...], ...], "k": 100}
    response: {"id": 7, "ids": [[...k ints...], ...],
               "dists": [[...k floats...], ...]}
    errors:   {"id": 7, "error": "..."}

Backend routing lives in ops/adc.py: on TPU the fused Pallas scan+select
kernel, on CPU hosts the native AVX-512 scanner (when built) or the pure
NumPy/JAX path. The reference's serving story is the bare C++ linscan
functions (src/linscan/Linscan.jl:5-73); this wraps the same operation as
a long-lived process so compiles/LUT setup are paid once.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True,
                    help="index directory from scripts/build_index.py")
    ap.add_argument("--k", type=int, default=100,
                    help="default neighbors per query (request may override)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the compile-triggering dummy batch")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from local_search_quantization_tpu.ops import adc
    from local_search_quantization_tpu.utils import checkpoint as ckpt

    with open(f"{args.index}/meta.json") as f:
        meta = json.load(f)
    model = ckpt.load_model(f"{args.index}/model.npz")
    codes = ckpt.load_codes(f"{args.index}/codes.npz")
    B = codes["B"]
    method, d = meta["method"], meta["d"]
    import jax

    if meta["h"] <= 256 and jax.default_backend() != "tpu":
        # uint8 codes let the native CPU scanner skip its per-request
        # range-validation passes over all n*m code entries (ops/adc.py).
        # TPU serving keeps int32: the device programs are compiled (and
        # VMEM-budgeted) for the int32 [m, n] layout.
        B = np.ascontiguousarray(B, np.uint8)

    if method in ("lsq", "chainq"):
        db_norms = codes["cbnorms"][codes["bnorm"]].astype(np.float32)
        # ChainQ queries rotate into the code space; LSQ folds R at training.
        R = np.asarray(model.R) if method == "chainq" else None

        def query(Q, k):
            return adc.linscan_lsq(B, Q, model.C, db_norms, k=k, R=R)
    elif method == "opq":

        def query(Q, k):
            return adc.linscan_opq(B, Q, model.C_sub, model.R, k=k)
    else:  # pq

        def query(Q, k):
            return adc.linscan_pq(B, Q, model.C_sub, k=k)

    if not args.no_warmup:
        query(np.zeros((1, d), np.float32), args.k)

    print(json.dumps({"ready": True, "method": method,
                      "n": int(B.shape[0]), "k": args.k}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line or line == "EOF":
            break
        req = None  # never attribute errors to the previous request's id
        try:
            req = json.loads(line)
            Q = np.asarray(req["vectors"], np.float32)
            if Q.ndim != 2 or Q.shape[1] != d:
                raise ValueError(f"vectors must be [nq, {d}], got {Q.shape}")
            k = int(req.get("k", args.k))
            if not 1 <= k <= B.shape[0]:
                raise ValueError(f"k={k} out of range [1, {B.shape[0]}]")
            res = query(Q, k)
            out = {"id": req.get("id"),
                   "ids": np.asarray(res.ids).tolist(),
                   "dists": np.asarray(res.dists).tolist()}
        except Exception as e:  # malformed request must not kill the server
            rid = req.get("id") if isinstance(req, dict) else None
            out = {"id": rid, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

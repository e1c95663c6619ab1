#!/usr/bin/env python
"""Serve k-NN queries over an index built by scripts/build_index.py.

JSON-lines protocol on stdin/stdout. First output line announces
readiness (after the warm-up batch has compiled the query program):

    {"ready": true, "method": "lsq", "n": 1000000, "k": 100}

then one response per request line:

    query:    {"id": 7, "vectors": [[...d floats...], ...], "k": 100}
           -> {"id": 7, "ids": [[...k ints...], ...],
               "dists": [[...k floats...], ...]}
    insert:   {"op": "add", "id": 8, "vectors": [[...], ...]}
           -> {"id": 8, "added": [n0, n0+1, ...], "n": new_total}
              (encodes with the FROZEN trained model — PQ/OPQ subspace
              assignment, ChainQ Viterbi, LSQ ILS at the build's round
              count — and appends; ids are assigned consecutively)
    errors:   {"id": 7, "error": "..."}

Backend routing lives in ops/adc.py: on TPU the fused Pallas scan+select
kernel, on CPU hosts the native AVX-512 scanner (when built) or the pure
NumPy/JAX path. The reference's serving story is the bare C++ linscan
functions (src/linscan/Linscan.jl:5-73); this wraps the same operation as
a long-lived process so compiles/LUT setup are paid once, and adds
dynamic inserts, which the reference has no analog of at all.
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

    import jax

    from local_search_quantization_tpu.ops import adc
    from local_search_quantization_tpu.utils import checkpoint as ckpt

    with open(f"{args.index}/meta.json") as f:
        meta = json.load(f)
    model = ckpt.load_model(f"{args.index}/model.npz")
    codes = ckpt.load_codes(f"{args.index}/codes.npz")
    method, d = meta["method"], meta["d"]
    additive = method in ("lsq", "chainq")

    # Mutable index state (codes + per-row norm term), appended to by "add".
    state = {"B": codes["B"]}
    if meta["h"] <= 256 and jax.default_backend() != "tpu":
        # uint8 codes let the native CPU scanner skip its per-request
        # range-validation passes over all n*m code entries (ops/adc.py).
        # TPU serving keeps int32: the device programs are compiled (and
        # VMEM-budgeted) for the int32 [m, n] layout.
        state["B"] = np.ascontiguousarray(state["B"], np.uint8)
    if additive:
        cbnorms = np.asarray(codes["cbnorms"], np.float32)
        state["dbn"] = cbnorms[codes["bnorm"]].astype(np.float32)
        # ChainQ queries rotate into the code space; LSQ folds R at training.
        R = np.asarray(model.R) if method == "chainq" else None

        def query(Q, k):
            return adc.linscan_lsq(state["B"], Q, model.C, state["dbn"],
                                   k=k, R=R)
    elif method == "opq":

        def query(Q, k):
            return adc.linscan_opq(state["B"], Q, model.C_sub, model.R, k=k)
    else:  # pq

        def query(Q, k):
            return adc.linscan_pq(state["B"], Q, model.C_sub, k=k)

    def _pad_pow2(X, lo=8):
        """Pad a batch to the next power of two (>= lo) so repeated adds
        reuse a handful of compiled encode programs instead of one per
        distinct batch size."""
        p = lo
        while p < X.shape[0]:
            p *= 2
        if p == X.shape[0]:
            return X
        return np.concatenate([X, np.repeat(X[:1], p - X.shape[0], axis=0)])

    def add(X):
        nreal = X.shape[0]
        Xp = _pad_pow2(X)
        if method == "pq":
            from local_search_quantization_tpu.models.pq import quantize_pq

            Bn = np.asarray(quantize_pq(Xp, model.C_sub))
        elif method == "opq":
            from local_search_quantization_tpu.models.opq import quantize_opq

            Bn = np.asarray(quantize_opq(Xp, model.R, model.C_sub))
        elif method == "chainq":
            from local_search_quantization_tpu.ops import viterbi

            Bn = np.asarray(viterbi.viterbi_encode(
                Xp @ np.asarray(model.R, np.float32), model.C))
        else:  # lsq: ILS from random codes at the build's round count
            from local_search_quantization_tpu.ops import icm
            from local_search_quantization_tpu.utils.synth import random_codes

            m, h = meta["m"], meta["h"]
            B0 = random_codes(0, Xp.shape[0], m, h)
            enc = icm.ils_encode(
                jax.random.PRNGKey(int(state["B"].shape[0])), Xp, B0,
                model.C, ilsiter=meta.get("ilsiter") or 16, icmiter=4,
                npert=min(4, m), randord=True)
            Bn = np.asarray(enc.B)
        Bn = Bn[:nreal]
        n0 = int(state["B"].shape[0])
        if additive:
            from local_search_quantization_tpu.ops import norms

            bn = np.asarray(norms.quantize_norms(Bn, model.C, cbnorms))
            state["dbn"] = np.concatenate([state["dbn"], cbnorms[bn]])
        state["B"] = np.concatenate(
            [state["B"], Bn.astype(state["B"].dtype)])
        return n0

    if not args.no_warmup:
        query(np.zeros((1, d), np.float32), args.k)

    print(json.dumps({"ready": True, "method": method,
                      "n": int(state["B"].shape[0]), "k": args.k}),
          flush=True)

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
            if req.get("op", "query") == "add":
                n0 = add(Q)
                out = {"id": req.get("id"),
                       "added": list(range(n0, n0 + Q.shape[0])),
                       "n": int(state["B"].shape[0])}
            else:
                k = int(req.get("k", args.k))
                if not 1 <= k <= state["B"].shape[0]:
                    raise ValueError(
                        f"k={k} out of range [1, {state['B'].shape[0]}]")
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

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
    delete:   {"op": "delete", "id": 9, "ids": [3, 17]}
           -> {"id": 9, "deleted": 2, "n": total}
              (O(1) tombstones: the row's distance term is pinned to +inf
              so it can never be returned; ids stay stable)
    persist:  {"op": "save", "id": 10} -> {"id": 10, "saved": ..., "n": ...}
              (writes the mutated codes back to the index directory)
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

    # Mutable index state: codes (+ per-row norm term), appended to by
    # "add"; a tombstone mask maintained by "delete" (deleted rows get a
    # +inf distance term so no scanner can ever return them; ids stay
    # stable, and scanners pad with (+inf, -1) sentinels when fewer than k
    # live rows exist).
    state = {"B": codes["B"],
             "tomb": codes.get("tomb", np.zeros(codes["B"].shape[0], bool))}
    state["tomb"] = np.asarray(state["tomb"], bool)
    if meta["h"] <= 256 and jax.default_backend() != "tpu":
        # uint8 codes let the native CPU scanner skip its per-request
        # range-validation passes over all n*m code entries (ops/adc.py).
        # TPU serving keeps int32: the device programs are compiled (and
        # VMEM-budgeted) for the int32 [m, n] layout.
        state["B"] = np.ascontiguousarray(state["B"], np.uint8)
    if additive:
        cbnorms = np.asarray(codes["cbnorms"], np.float32)
        state["bnorm"] = np.asarray(codes["bnorm"])
        state["dbn"] = cbnorms[state["bnorm"]].astype(np.float32)
        state["dbn"][state["tomb"]] = np.inf
        # ChainQ queries rotate into the code space; LSQ folds R at training.
        R = np.asarray(model.R) if method == "chainq" else None

        def query(Q, k):
            return adc.linscan_lsq(state["B"], Q, model.C, state["dbn"],
                                   k=k, R=R)
    else:
        # PQ/OPQ have no norm term; tombstones ride the optional extra
        # array (all-zero elsewhere — exactness preserved), materialized
        # lazily on the first delete.
        state["extra"] = None
        if state["tomb"].any():
            state["extra"] = np.where(
                state["tomb"], np.inf, 0.0).astype(np.float32)
        if method == "opq":

            def query(Q, k):
                return adc.linscan_opq(state["B"], Q, model.C_sub, model.R,
                                       k=k, extra=state["extra"])
        else:  # pq

            def query(Q, k):
                return adc.linscan_pq(state["B"], Q, model.C_sub, k=k,
                                      extra=state["extra"])

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
            state["bnorm"] = np.concatenate([state["bnorm"], bn])
            state["dbn"] = np.concatenate([state["dbn"], cbnorms[bn]])
        elif state["extra"] is not None:
            state["extra"] = np.concatenate(
                [state["extra"], np.zeros(nreal, np.float32)])
        state["tomb"] = np.concatenate([state["tomb"],
                                        np.zeros(nreal, bool)])
        state["B"] = np.concatenate(
            [state["B"], Bn.astype(state["B"].dtype)])
        return n0

    def delete(ids):
        ids = np.asarray(ids, np.int64)
        n = state["B"].shape[0]
        if ids.size and (ids.min() < 0 or ids.max() >= n):
            raise ValueError(f"delete ids out of range [0, {n})")
        state["tomb"][ids] = True
        if additive:
            state["dbn"][ids] = np.inf
        else:
            if state["extra"] is None:
                state["extra"] = np.zeros(n, np.float32)
            state["extra"][ids] = np.inf
        return int(ids.size)

    def save():
        import os

        extra_cols: dict = {"tomb": state["tomb"]}
        if additive:
            extra_cols["bnorm"] = state["bnorm"]
            extra_cols["cbnorms"] = cbnorms
        tmp = f"{args.index}/codes.tmp.npz"  # savez appends .npz itself
        ckpt.save_codes(tmp, state["B"], extra_cols)
        os.replace(tmp, f"{args.index}/codes.npz")
        meta["n"] = int(state["B"].shape[0])
        with open(f"{args.index}/meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        return f"{args.index}/codes.npz"

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
            op = req.get("op", "query")
            if op == "delete":
                ndel = delete(req["ids"])
                out = {"id": req.get("id"), "deleted": ndel,
                       "n": int(state["B"].shape[0])}
            elif op == "save":
                path = save()
                out = {"id": req.get("id"), "saved": path,
                       "n": int(state["B"].shape[0])}
            else:
                Q = np.asarray(req["vectors"], np.float32)
                if Q.ndim != 2 or Q.shape[1] != d:
                    raise ValueError(
                        f"vectors must be [nq, {d}], got {Q.shape}")
                if op == "add":
                    n0 = add(Q)
                    out = {"id": req.get("id"),
                           "added": list(range(n0, n0 + Q.shape[0])),
                           "n": int(state["B"].shape[0])}
                elif op == "query":
                    k = int(req.get("k", args.k))
                    if not 1 <= k <= state["B"].shape[0]:
                        raise ValueError(
                            f"k={k} out of range [1, {state['B'].shape[0]}]")
                    res = query(Q, k)
                    out = {"id": req.get("id"),
                           "ids": np.asarray(res.ids).tolist(),
                           "dists": np.asarray(res.dists).tolist()}
                else:
                    raise ValueError(f"unknown op {op!r}")
        except Exception as e:  # malformed request must not kill the server
            rid = req.get("id") if isinstance(req, dict) else None
            out = {"id": rid, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Build a serving index directory: train a quantizer, encode the base set,
persist everything `scripts/serve.py` needs.

The reference stops at demo scripts that train + query in one process; this
is the production split: build once (TPU-heavy), serve anywhere (TPU select
kernel or the native CPU scanner — `ops/adc.py` routes by platform).

Index directory layout:
    meta.json   method / shapes / bit budget / build args
    model.npz   the trained model NamedTuple (utils/checkpoint.save_model)
    codes.npz   B [n, m] int32 base codes; bnorm [n] int32 norm codes and
                cbnorms [h] f32 for the additive methods (lsq, chainq)

Usage:
    python scripts/build_index.py --method lsq --out ./index_lsq \
        --ntrain 100000 --nbase 1000000 --niter 10 --ilsiter 16
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", required=True,
                    choices=["pq", "opq", "chainq", "lsq"])
    ap.add_argument("--out", required=True, help="index directory to create")
    ap.add_argument("--dataset", default="SIFT1M")
    ap.add_argument("--ntrain", type=int, default=100_000)
    ap.add_argument("--nbase", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=None,
                    help="codebooks; default 8 (pq/opq) or 7+norm byte "
                         "(chainq/lsq) = 64-bit codes")
    ap.add_argument("--h", type=int, default=256)
    ap.add_argument("--niter", type=int, default=10)
    ap.add_argument("--ilsiter", type=int, default=16,
                    help="ILS rounds for the lsq base encode")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synth-d", type=int, default=128)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from local_search_quantization_tpu.models import (
        train_chainq, train_lsq, train_opq, train_pq,
    )
    from local_search_quantization_tpu.models.opq import quantize_opq
    from local_search_quantization_tpu.models.pq import quantize_pq
    from local_search_quantization_tpu.ops import icm, norms, viterbi
    from local_search_quantization_tpu.utils import checkpoint as ckpt
    from local_search_quantization_tpu.utils.config import (
        ChainQConfig, LSQConfig, OPQConfig, PQConfig,
    )
    from local_search_quantization_tpu.utils.io import (
        dataset_available, read_dataset,
    )
    from local_search_quantization_tpu.utils.synth import (
        random_codes, synthetic_dataset,
    )

    additive = args.method in ("chainq", "lsq")
    m = args.m if args.m is not None else (7 if additive else 8)
    h = args.h

    if args.dataset != "synthetic" and dataset_available(args.dataset):
        x_train = read_dataset(args.dataset, args.ntrain).astype(np.float32)
        x_base = read_dataset(args.dataset + "_base", args.nbase).astype(
            np.float32)
        dataset = args.dataset
    else:
        print(f"[build] {args.dataset} files not on disk; synthetic corpus")
        dd = synthetic_dataset(args.seed, d=args.synth_d,
                               n_train=args.ntrain, n_base=args.nbase,
                               n_query=1)
        x_train, x_base = dd.train, dd.base
        dataset = "synthetic"
    d = x_train.shape[1]

    t0 = time.time()
    extra: dict = {}
    if args.method == "pq":
        model = train_pq(x_train, PQConfig(
            m=m, h=h, kmeans_maxiter=max(25, args.niter), seed=args.seed))
        B = np.asarray(quantize_pq(x_base, model.C_sub))
    elif args.method == "opq":
        model = train_opq(x_train, OPQConfig(
            m=m, h=h, niter=args.niter, seed=args.seed))
        B = np.asarray(quantize_opq(x_base, model.R, model.C_sub))
    elif args.method == "chainq":
        opq = train_opq(x_train, OPQConfig(
            m=m, h=h, niter=args.niter, seed=args.seed))
        model = train_chainq(x_train, opq.B, opq.R,
                             ChainQConfig(m=m, h=h, niter=args.niter))
        RXb = np.asarray(x_base, np.float32) @ np.asarray(model.R)
        B = np.asarray(viterbi.viterbi_encode(RXb, model.C))
        key = jax.random.PRNGKey(args.seed + 2)
        cbn, _ = norms.train_norm_codebook(key, B[:100_000], model.C, h)
        extra = {"bnorm": np.asarray(norms.quantize_norms(B, model.C, cbn)),
                 "cbnorms": np.asarray(cbn)}
    else:  # lsq
        opq = train_opq(x_train, OPQConfig(
            m=m, h=h, niter=args.niter, seed=args.seed))
        chain = train_chainq(x_train, opq.B, opq.R,
                             ChainQConfig(m=m, h=h, niter=args.niter))
        cfg = LSQConfig(m=m, h=h, niter=args.niter, seed=args.seed,
                        npert=min(4, m))  # reference default npert=4 needs m>=4
        model = train_lsq(x_train, chain.B, chain.R, cfg, verbose=True)
        B0 = random_codes(args.seed, x_base.shape[0], m, h)
        enc = icm.encode_chunked(
            jax.random.PRNGKey(args.seed + 1), x_base, B0, model.C,
            ilsiter=args.ilsiter, icmiter=cfg.icmiter, npert=cfg.npert,
            randord=cfg.randord,
        )
        B = np.asarray(enc.B)
        extra = {
            "bnorm": np.asarray(
                norms.quantize_norms(B, model.C, model.cbnorms)),
            "cbnorms": np.asarray(model.cbnorms),
        }
    build_s = round(time.time() - t0, 1)

    os.makedirs(args.out, exist_ok=True)
    ckpt.save_model(os.path.join(args.out, "model.npz"), model)
    ckpt.save_codes(os.path.join(args.out, "codes.npz"), B, extra)
    bits = int(m * np.ceil(np.log2(h))) + (8 if additive else 0)
    meta = {
        "method": args.method, "m": m, "h": h, "d": int(d),
        "n": int(B.shape[0]), "bits": bits, "dataset": dataset,
        "niter": args.niter, "seed": args.seed,
        "ilsiter": args.ilsiter if args.method == "lsq" else None,
        "build_s": build_s,
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"[build] wrote {args.out} ({meta})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Serving-protocol overhead: scripts/serve.py JSON-lines vs direct
Index.search, host CPU native-scanner path.

The reference's serving story is bare in-process ccall scanners
(/root/reference/src/linscan/Linscan.jl:5-73) — it has no protocol to
measure. This pins what our production surface costs on top of the same
scan: JSON parse of the query vectors, the search, and JSON
serialization of [nq, k] ids + dists.

Usage: python benchmarks/bench_serve.py [n] [nq] [k] [batch]
Prints direct qps, protocol qps, and the overhead ratio.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import _bootstrap  # noqa: F401

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from local_search_quantization_tpu.index import Index
    from local_search_quantization_tpu.utils.synth import synthetic_dataset

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 256

    data = synthetic_dataset(0, d=128, n_train=20_000, n_base=n,
                             n_query=nq)
    idx = Index.build(data.train, data.base, "pq", m=8, h=256, niter=10,
                      seed=0)

    # Direct in-process search (per-batch, same batching as the protocol).
    idx.search(data.query[:batch], k)  # warm
    t0 = time.perf_counter()
    for s in range(0, nq, batch):
        idx.search(data.query[s:s + batch], k)
    direct_qps = nq / (time.perf_counter() - t0)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "idx")
        idx.save(path)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "scripts", "serve.py"),
             "--index", path, "--k", str(k), "--platform", "cpu"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            cwd=repo,
        )
        ready = json.loads(proc.stdout.readline())
        assert ready.get("ready"), ready
        def pump(extra: dict) -> float:
            reqs = []
            for i, s in enumerate(range(0, nq, batch)):
                reqs.append(json.dumps(
                    {"id": i, "vectors": data.query[s:s + batch].tolist(),
                     "k": k, **extra}) + "\n")
            # One warm round-trip, then the timed pump (write-all then
            # read-all deadlocks on pipe buffers, so request/response).
            proc.stdin.write(reqs[0])
            proc.stdin.flush()
            json.loads(proc.stdout.readline())
            t0 = time.perf_counter()
            for r in reqs:
                proc.stdin.write(r)
                proc.stdin.flush()
                resp = json.loads(proc.stdout.readline())
                assert "error" not in resp, resp
            return nq / (time.perf_counter() - t0)

        proto_qps = pump({})
        ids_only_qps = pump({"dists": False})
        proc.stdin.write("EOF\n")
        proc.stdin.flush()
        proc.wait(timeout=60)

    print(f"n={n} nq={nq} k={k} batch={batch} "
          f"direct {direct_qps:,.0f} qps | serve.py protocol "
          f"{proto_qps:,.0f} qps (overhead "
          f"{100 * (direct_qps / proto_qps - 1):.0f}%) | ids-only "
          f"{ids_only_qps:,.0f} qps (overhead "
          f"{100 * (direct_qps / ids_only_qps - 1):.0f}%)")


if __name__ == "__main__":
    main()

"""End-to-end pipelines on the synthetic Gaussian-mixture dataset:
train -> encode base -> query -> recall (SURVEY.md §4's golden-threshold
strategy; the reference's only integration tests are its demos)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from local_search_quantization_tpu.models import (
    train_chainq,
    train_lsq,
    train_opq,
    train_pq,
    quantize_opq,
    quantize_pq,
)
from local_search_quantization_tpu.ops import adc, costs, icm, norms
from local_search_quantization_tpu.utils.config import (
    ChainQConfig,
    LSQConfig,
    OPQConfig,
    PQConfig,
)
from local_search_quantization_tpu.utils.eval import eval_recall
from local_search_quantization_tpu.utils.synth import random_codes, synthetic_dataset


@pytest.fixture(scope="module")
def data():
    return synthetic_dataset(0, d=32, n_train=1500, n_base=6000, n_query=60)


def test_pq_pipeline_recall(data):
    model = train_pq(data.train, PQConfig(m=4, h=32, seed=0))
    B_base = quantize_pq(data.base, model.C_sub)
    res = adc.linscan_pq(np.asarray(B_base), data.query, model.C_sub, k=100,
                         query_chunk=64, base_block=2048)
    rec = eval_recall(data.gt, res.ids, 100, verbose=False)
    # ~20-bit codes on the synthetic corpus; r@100 is capped near the 0.9
    # planted-query fraction (fresh-sample queries are near-unfindable at
    # this code budget), so the ceiling assertion sits below it.
    assert rec[0] > 0.03  # recall@1
    assert rec[9] > 0.3  # recall@10
    assert rec[99] > 0.78  # recall@100


def test_opq_pipeline_recall(data):
    model = train_opq(data.train, OPQConfig(m=4, h=32, niter=8, seed=0))
    B_base = quantize_opq(data.base, model.R, model.C_sub)
    res = adc.linscan_opq(np.asarray(B_base), data.query, model.C_sub, model.R,
                          k=100, query_chunk=64, base_block=2048)
    rec = eval_recall(data.gt, res.ids, 100, verbose=False)
    assert rec[0] > 0.03
    assert rec[9] > 0.3
    assert rec[99] > 0.78  # see test_pq_pipeline_recall on the 0.9 cap


def test_chainq_then_lsq_pipeline(data):
    """The flagship demo_lsq flow: OPQ -> ChainQ -> LSQ -> base encode ->
    norm quantization -> additive ADC query -> recall."""
    m, h = 4, 32
    opq = train_opq(data.train, OPQConfig(m=m, h=h, niter=5, seed=0))
    chain = train_chainq(
        data.train, opq.B, opq.R, ChainQConfig(m=m, h=h, niter=3)
    )
    # ChainQ objective decreases.
    assert chain.obj[-1] <= chain.obj[0] * 1.001

    lsq = train_lsq(
        data.train,
        chain.B,
        chain.R,
        LSQConfig(m=m, h=h, niter=3, ilsiter=3, icmiter=2, npert=1, seed=0),
    )
    # LSQ beats its chain init on train MSE.
    train_mse = float(costs.qerror(jnp.asarray(data.train), lsq.B, lsq.C))
    assert train_mse <= chain.obj[-1] * 1.05

    # Encode base with ILS, quantize norms, query.
    B0 = random_codes(0, data.base.shape[0], m, h)
    enc = icm.encode_chunked(
        jax.random.PRNGKey(7), data.base, B0, lsq.C,
        ilsiter=4, icmiter=2, npert=1, chunk=2048,
    )
    bnorm_codes = norms.quantize_norms(jnp.asarray(enc.B), lsq.C, lsq.cbnorms)
    db_norms = np.asarray(lsq.cbnorms)[np.asarray(bnorm_codes)]
    res = adc.linscan_lsq(enc.B, data.query, lsq.C, db_norms, k=100,
                          query_chunk=64, base_block=2048)
    rec = eval_recall(data.gt, res.ids, 100, verbose=False)
    assert rec[0] > 0.03
    assert rec[9] > 0.3
    assert rec[99] > 0.75  # see test_pq_pipeline_recall on the 0.9 cap


def test_lsq_stochastic_relaxation_variants(data):
    """SR-D / SR-C (LSQ++, arXiv:1806.05643; beyond the reference): the
    annealed-noise trainers must stay sane (noise reaches zero by the last
    iteration, so the final solve+encode is plain LSQ) and land within a
    small factor of — typically below — the plain-LSQ objective."""
    import dataclasses

    import pytest

    from local_search_quantization_tpu.models import train_chainq, train_opq
    from local_search_quantization_tpu.utils.config import ChainQConfig, OPQConfig

    m, h = 4, 16
    opq = train_opq(data.train, OPQConfig(m=m, h=h, niter=3, seed=2))
    chain = train_chainq(data.train, opq.B, opq.R, ChainQConfig(m=m, h=h, niter=2))
    base_cfg = LSQConfig(m=m, h=h, niter=6, ilsiter=2, icmiter=2, npert=1, seed=2)
    finals = {}
    for sr in ("none", "SR-D", "SR-C"):
        lsq = train_lsq(
            data.train, chain.B, chain.R,
            dataclasses.replace(base_cfg, sr_method=sr),
        )
        finals[sr] = float(
            costs.qerror(jnp.asarray(data.train), lsq.B, lsq.C)
        )
        assert np.isfinite(finals[sr]), sr
    # At test scale (6 iters) the annealing has little room — only bound
    # the damage; the quality WIN shows at paper scale/iteration counts
    # (see BASELINE.md). SR-C is the noisier variant.
    assert finals["SR-D"] <= finals["none"] * 1.10
    assert finals["SR-C"] <= finals["none"] * 1.25

    with pytest.raises(ValueError):
        dataclasses.replace(base_cfg, sr_method="bogus")


def test_lsq_objective_nonincreasing(data):
    """Monotonicity invariant the reference only prints (SURVEY.md §4.2):
    with accept-if-better encoding and exact LS codebook updates, the
    objective trace must be non-increasing up to solver tolerance."""
    m, h = 4, 16
    opq = train_opq(data.train, OPQConfig(m=m, h=h, niter=4, seed=1))
    chain = train_chainq(data.train, opq.B, opq.R, ChainQConfig(m=m, h=h, niter=2))
    lsq = train_lsq(
        data.train, chain.B, chain.R,
        LSQConfig(m=m, h=h, niter=4, ilsiter=2, icmiter=2, npert=1, seed=1),
    )
    objs = np.asarray(lsq.obj)
    assert (np.diff(objs) <= np.abs(objs[:-1]) * 0.01).all(), objs


def test_repro_paper_smoke(tmp_path):
    """scripts/repro_paper.py plumbing at smoke scale (subprocess, CPU):
    every optional method row (--with-chainq, --with-slsq SLSQ1/SLSQ2)
    lands in the JSON artifact with a full recall curve. The strict
    LSQ >= OPQ ordering assertion is a paper-scale contract — at this
    tiny scale an inversion is sampling noise, so a nonzero exit is
    tolerated iff it is that assertion (the artifact is written first)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "table.json"
    proc = subprocess.run(
        [sys.executable, "scripts/repro_paper.py",
         "--dataset", "synthetic", "--ntrain", "600", "--nbase", "3000",
         "--nquery", "40", "--niter", "2", "--h", "16", "--knn", "40",
         "--milestones", "2", "--with-chainq", "--with-slsq",
         "--platform", "cpu", "--scan-mode", "gather",
         "--stage-cache", str(tmp_path / "stages"), "--out", str(out)],
        cwd=repo, capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0 or "ORDERING FAILED" in (
        proc.stdout + proc.stderr
    ), proc.stderr[-2000:] + proc.stdout[-2000:]
    with open(out) as f:
        table = json.load(f)
    rows = table["methods"]
    for name in ("PQ", "OPQ", "ChainQ", "LSQ-2", "SLSQ1", "SLSQ2"):
        assert name in rows, (name, sorted(rows))
        assert rows[name]["recall"]["r@10"] >= 0.0
    for name in ("SLSQ1", "SLSQ2"):
        assert 0 < rows[name]["l0"] <= rows[name]["S"]
    # SLSQ1's budget (S = d*h) is below dense at ANY h; SLSQ2's
    # (S = d*h + d^2) only at the reference's h=256 scale, not this smoke h.
    assert rows["SLSQ1"]["l0"] < rows["SLSQ1"]["dense_l0"]

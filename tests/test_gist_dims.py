"""GIST-dimension (d=960) shape coverage.

The reference's dataset registry serves GIST1M (d=960) through the same
pipelines as SIFT (/root/reference/src/read/read_datasets.jl:22-26), so
every trainer and query engine here must be shape-generic well beyond
d=128. d=960 with m=7 exercises the zero-padded subspace layout at a new
remainder (960 % 7 = 1 -> reference split sizes [138, 137 x 6],
/root/reference/src/utils.jl:152-177), and the ADC engines at a LUT-build
width 7.5x the usual tests'. Assertions are exactness oracles (ADC == true
reconstruction distance), not quality gates — the corpus calibration is
SIFT-statistics and only the shapes are under test at this dim.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from local_search_quantization_tpu.models import (
    train_lsq,
    train_pq,
    quantize_pq,
)
from local_search_quantization_tpu.ops import adc, costs, norms
from local_search_quantization_tpu.ops.subspaces import padded_width
from local_search_quantization_tpu.utils.config import LSQConfig, PQConfig
from local_search_quantization_tpu.utils.eval import eval_recall
from local_search_quantization_tpu.utils.synth import (
    random_codes,
    synthetic_dataset,
)

D = 960


@pytest.fixture(scope="module")
def gist():
    return synthetic_dataset(3, d=D, n_train=600, n_base=2500, n_query=40)


def test_pq_gist_uneven_split_exact_adc(gist):
    """PQ at (d=960, m=7): padded per-subspace codebooks, and the PQ ADC
    distance must equal the true query->reconstruction distance exactly
    (cross-subspace terms vanish for PQ, so ADC is not an approximation)."""
    m, h = 7, 16
    model = train_pq(gist.train, PQConfig(m=m, h=h, seed=0))
    assert model.C_sub.shape == (m, h, padded_width(D, m))

    B_base = np.asarray(quantize_pq(gist.base, model.C_sub))
    assert B_base.shape == (gist.base.shape[0], m)
    res = adc.linscan_pq(B_base, gist.query, model.C_sub, k=50,
                         query_chunk=40, base_block=1024)

    # Oracle: reconstruct the padded subspaces, compare true distances.
    from local_search_quantization_tpu.ops.subspaces import merge_subspaces

    xhat_blocks = jnp.take_along_axis(
        jnp.asarray(model.C_sub),
        jnp.asarray(B_base.T)[:, :, None].repeat(model.C_sub.shape[2], 2),
        axis=1,
    )
    xhat = np.asarray(merge_subspaces(xhat_blocks, D))
    del xhat_blocks
    true_d = (
        (gist.query ** 2).sum(1)[:, None]
        - 2.0 * gist.query @ xhat.T
        + (xhat ** 2).sum(1)[None, :]
    )
    ids = np.asarray(res.ids)
    got = np.asarray(res.dists)
    want = np.take_along_axis(true_d, ids, axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-1)
    # And the returned distances are the true k smallest (tie-robust: at
    # h=16 many rows share identical codes, so id SETS under ties are
    # legitimately scanner-dependent — values are not).
    np.testing.assert_allclose(
        got, np.sort(true_d, axis=1)[:, :50], rtol=2e-4, atol=2e-1
    )

    # Deliberate smoke threshold (NOT an exactness oracle like the rest of
    # this file): tied to synth corpus v4 + seed 3; far below the ~0.5
    # observed so a corpus recalibration or PRNG change won't trip it.
    rec = eval_recall(gist.gt, ids, 50, verbose=False)
    assert rec[49] > 0.2


def test_lsq_gist_train_encode_query(gist):
    """LSQ at d=960 (full-dimensional additive codebooks, no padding):
    short train from random init, norm quantization, additive ADC query
    whose distances match the -2<q,xhat> + ||xhat||^2_quantized contract."""
    m, h = 7, 16
    n = gist.train.shape[0]
    B0 = random_codes(1, n, m, h)
    lsq = train_lsq(
        gist.train, B0, np.eye(D, dtype=np.float32),
        LSQConfig(m=m, h=h, niter=2, ilsiter=2, icmiter=2, npert=1, seed=1),
    )
    assert lsq.C.shape == (m, h, D)
    # The obj trace samples qerror BETWEEN a ridge codebook solve and the
    # next encode (models/lsq.py:100-123): the ridge term means the solve
    # minimizes a *regularized* objective, so tiny true-objective upticks
    # between consecutive samples are legitimate — the 1% slack is
    # deliberate. (The strict non-increase invariant lives inside the
    # encode's per-vector accept-if-better and is asserted in test_icm.)
    objs = np.asarray(lsq.obj)
    assert (np.diff(objs) <= np.abs(objs[:-1]) * 0.01).all(), objs

    # Encode a base slice and query through the additive scanner.
    nb = 1200
    base = gist.base[:nb]
    from local_search_quantization_tpu.ops import icm

    enc = icm.encode_chunked(
        jax.random.PRNGKey(5), base, random_codes(2, nb, m, h), lsq.C,
        ilsiter=2, icmiter=2, npert=1, chunk=512,
    )
    bcodes = norms.quantize_norms(jnp.asarray(enc.B), lsq.C, lsq.cbnorms)
    db_norms = np.asarray(lsq.cbnorms)[np.asarray(bcodes)]
    res = adc.linscan_lsq(enc.B, gist.query, lsq.C, db_norms, k=20,
                          query_chunk=40, base_block=512)

    # Oracle: the scanner's distance is -2 q.xhat + quantized ||xhat||^2.
    xhat = np.asarray(costs.reconstruct(enc.B, lsq.C))
    want_full = -2.0 * gist.query @ xhat.T + db_norms[None, :]
    want = np.take_along_axis(want_full, np.asarray(res.ids), axis=1)
    np.testing.assert_allclose(np.asarray(res.dists), want,
                               rtol=2e-4, atol=2e-1)

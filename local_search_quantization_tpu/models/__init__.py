"""Trainers: PQ, OPQ, ChainQ, LSQ (and sparse LSQ)."""

from local_search_quantization_tpu.models.chainq import ChainQModel, train_chainq
from local_search_quantization_tpu.models.lsq import LSQModel, train_lsq
from local_search_quantization_tpu.models.opq import OPQModel, quantize_opq, train_opq
from local_search_quantization_tpu.models.pq import PQModel, quantize_pq, train_pq
from local_search_quantization_tpu.models.rvq import RVQModel, quantize_rvq, train_rvq
from local_search_quantization_tpu.models.slsq import SLSQModel, train_lsq_sparse

__all__ = [
    "PQModel", "train_pq", "quantize_pq",
    "OPQModel", "train_opq", "quantize_opq",
    "ChainQModel", "train_chainq",
    "LSQModel", "train_lsq",
    "RVQModel", "train_rvq", "quantize_rvq",
    "SLSQModel", "train_lsq_sparse",
]

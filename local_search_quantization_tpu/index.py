"""Servable MCQ index: one frozen trained model + a mutable code store.

The reference stops at demo scripts that train and query in one process
(/root/reference/demos/demo_lsq.jl); this is the library-level production
surface behind `scripts/build_index.py` / `scripts/serve.py`:

    idx = Index.build(x_train, x_base, method="lsq")   # TPU-heavy, once
    idx.save("./index_lsq")
    ...
    idx = Index.load("./index_lsq")                    # serve anywhere
    res = idx.search(queries, k=100)                   # TPU kernel or
                                                       # native CPU scanner
    idx.add(new_vectors)      # encode with the frozen model, append
    idx.delete([3, 17])       # O(1) +inf tombstones; ids stay stable
    idx.save("./index_lsq")   # persist mutations atomically

Search routing lives in ops/adc.py (fused Pallas select kernel on TPU,
native AVX-512 scanner on CPU hosts); this module owns the lifecycle.
"""

from __future__ import annotations

import json
import os

import numpy as np

from local_search_quantization_tpu.ops import adc
from local_search_quantization_tpu.utils import checkpoint as ckpt

_METHODS = ("pq", "opq", "chainq", "lsq")


class Index:
    """A frozen quantizer model + mutable codes, searchable and persistable.

    Attributes:
      method: one of "pq", "opq", "chainq", "lsq".
      model: the trained model NamedTuple (PQModel/OPQModel/ChainQModel/
        LSQModel).
      B: [n, m] codes (int32, or uint8 on CPU serving hosts).
      meta: provenance dict (build args, bit budget, dataset name).
    """

    def __init__(self, method: str, model, B: np.ndarray, *,
                 bnorm: np.ndarray | None = None,
                 tomb: np.ndarray | None = None,
                 meta: dict | None = None):
        if method not in _METHODS:
            raise ValueError(f"method must be one of {_METHODS}, got {method}")
        self.method = method
        self.model = model
        self.B = np.asarray(B)
        self.meta = dict(meta or {})
        self.meta.setdefault("method", method)
        self._tomb = (np.zeros(self.B.shape[0], bool) if tomb is None
                      else np.asarray(tomb, bool).copy())
        self._extra = None  # pq/opq tombstone carrier, built lazily
        if self.additive:
            if bnorm is None:
                raise ValueError(f"{method} needs bnorm norm codes")
            self._cbnorms = np.asarray(self.model.cbnorms, np.float32) \
                if method == "lsq" else np.asarray(
                    self.meta_cbnorms(bnorm), np.float32)
            self._bnorm = np.asarray(bnorm)
            self._dbn = self._cbnorms[self._bnorm].astype(np.float32)
            self._dbn[self._tomb] = np.inf
        elif self._tomb.any():
            self._extra = np.where(self._tomb, np.inf, 0.0).astype(np.float32)

    # -- construction ------------------------------------------------------

    @classmethod
    def build(cls, x_train, x_base, method: str = "lsq", *,
              m: int | None = None, h: int = 256, niter: int = 10,
              ilsiter: int = 16, seed: int = 0, verbose: bool = False,
              meta: dict | None = None) -> "Index":
        """Train a quantizer on x_train and encode x_base.

        Defaults give 64-bit codes at h=256: m=8 for pq/opq, m=7 plus a
        1-byte norm code for the additive methods (the reference demo
        budget, demos/demo_pq.jl:12-17, demo_lsq.jl:14-19).
        """
        import jax

        from local_search_quantization_tpu.models import (
            train_chainq, train_lsq, train_opq, train_pq,
        )
        from local_search_quantization_tpu.models.opq import quantize_opq
        from local_search_quantization_tpu.models.pq import quantize_pq
        from local_search_quantization_tpu.ops import icm, norms, viterbi
        from local_search_quantization_tpu.utils.config import (
            ChainQConfig, LSQConfig, OPQConfig, PQConfig,
        )
        from local_search_quantization_tpu.utils.synth import random_codes

        additive = method in ("chainq", "lsq")
        if m is None:
            m = 7 if additive else 8
        x_train = np.asarray(x_train, np.float32)
        x_base = np.asarray(x_base, np.float32)
        bnorm = None
        if method == "pq":
            model = train_pq(x_train, PQConfig(
                m=m, h=h, kmeans_maxiter=max(25, niter), seed=seed))
            B = np.asarray(quantize_pq(x_base, model.C_sub))
        elif method == "opq":
            model = train_opq(x_train, OPQConfig(
                m=m, h=h, niter=niter, seed=seed))
            B = np.asarray(quantize_opq(x_base, model.R, model.C_sub))
        elif method == "chainq":
            opq = train_opq(x_train, OPQConfig(
                m=m, h=h, niter=niter, seed=seed))
            model = train_chainq(x_train, opq.B, opq.R,
                                 ChainQConfig(m=m, h=h, niter=niter))
            B = np.asarray(viterbi.viterbi_encode(
                x_base @ np.asarray(model.R), model.C))
            key = jax.random.PRNGKey(seed + 2)
            cbn, _ = norms.train_norm_codebook(key, B[:100_000], model.C, h)
            # ChainQModel carries no norm codebook; stash it in meta.
            meta = dict(meta or {})
            meta["cbnorms"] = np.asarray(cbn).tolist()
            bnorm = np.asarray(norms.quantize_norms(B, model.C, cbn))
        else:  # lsq
            opq = train_opq(x_train, OPQConfig(
                m=m, h=h, niter=niter, seed=seed))
            chain = train_chainq(x_train, opq.B, opq.R,
                                 ChainQConfig(m=m, h=h, niter=niter))
            cfg = LSQConfig(m=m, h=h, niter=niter, seed=seed,
                            npert=min(4, m))
            model = train_lsq(x_train, chain.B, chain.R, cfg,
                              verbose=verbose)
            B0 = random_codes(seed, x_base.shape[0], m, h)
            enc = icm.encode_chunked(
                jax.random.PRNGKey(seed + 1), x_base, B0, model.C,
                ilsiter=ilsiter, icmiter=cfg.icmiter, npert=cfg.npert,
                randord=cfg.randord)
            B = np.asarray(enc.B)
            bnorm = np.asarray(
                norms.quantize_norms(B, model.C, model.cbnorms))
        full_meta = {
            "method": method, "m": m, "h": h, "d": int(x_train.shape[1]),
            "n": int(B.shape[0]),
            "bits": int(m * np.ceil(np.log2(h))) + (8 if additive else 0),
            "niter": niter, "seed": seed,
            "ilsiter": ilsiter if method == "lsq" else None,
        }
        full_meta.update(meta or {})
        return cls(method, model, B, bnorm=bnorm, meta=full_meta)

    @classmethod
    def load(cls, path: str) -> "Index":
        """Load an index directory written by save() / build_index.py.

        On non-TPU hosts, int32 codes at h<=256 are converted to uint8 so
        the native scanner skips its per-request range-validation passes;
        TPU hosts keep int32 (the device programs are compiled for the
        int32 [m, n] layout).
        """
        import jax

        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        model = ckpt.load_model(os.path.join(path, "model.npz"))
        codes = ckpt.load_codes(os.path.join(path, "codes.npz"))
        B = codes["B"]
        if meta["h"] <= 256 and jax.default_backend() != "tpu":
            B = np.ascontiguousarray(B, np.uint8)
        if meta["method"] in ("chainq",) and "cbnorms" in codes:
            meta = dict(meta)
            meta["cbnorms"] = np.asarray(codes["cbnorms"]).tolist()
        return cls(meta["method"], model, B, bnorm=codes.get("bnorm"),
                   tomb=codes.get("tomb"), meta=meta)

    def save(self, path: str) -> str:
        """Persist model + codes (+ norm codes, tombstones) atomically."""
        os.makedirs(path, exist_ok=True)
        ckpt.save_model(os.path.join(path, "model.npz"), self.model)
        extra_cols: dict = {"tomb": self._tomb}
        if self.additive:
            extra_cols["bnorm"] = self._bnorm
            extra_cols["cbnorms"] = self._cbnorms
        tmp = os.path.join(path, "codes.tmp.npz")  # savez appends .npz
        ckpt.save_codes(tmp, self.B, extra_cols)
        out = os.path.join(path, "codes.npz")
        os.replace(tmp, out)
        meta = {k: v for k, v in self.meta.items() if k != "cbnorms"}
        meta["n"] = self.n
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return out

    # -- properties --------------------------------------------------------

    @property
    def additive(self) -> bool:
        return self.method in ("chainq", "lsq")

    @property
    def n(self) -> int:
        """Total rows including tombstoned ones (ids are stable)."""
        return int(self.B.shape[0])

    @property
    def active(self) -> int:
        return int(self.n - self._tomb.sum())

    @property
    def d(self) -> int:
        return int(self.meta["d"])

    def meta_cbnorms(self, bnorm) -> np.ndarray:
        cbn = self.meta.get("cbnorms")
        if cbn is None:
            raise ValueError("chainq index is missing its norm codebook")
        return np.asarray(cbn, np.float32)

    # -- operations ---------------------------------------------------------

    def search(self, Q, k: int = 100, *, mesh=None) -> adc.KNNResult:
        """Exact ADC k-NN. Beyond `active` rows, results pad with the
        (+inf, -1) sentinel.

        mesh: an optional `jax.sharding.Mesh` — the database axis is
        sharded across its devices and each shard's top-k is merged
        (parallel/query.py), the multi-chip serving path.
        """
        Q = np.asarray(Q, np.float32)
        if Q.ndim != 2 or Q.shape[1] != self.d:
            raise ValueError(f"queries must be [nq, {self.d}], got {Q.shape}")
        if not 1 <= k <= self.n:
            raise ValueError(f"k={k} out of range [1, {self.n}]")
        model = self.model
        if mesh is not None:
            from local_search_quantization_tpu.parallel import query as pq_mod

            B = self.B.astype(np.int32, copy=False)
            if self.additive:
                Qr = Q @ np.asarray(model.R, np.float32) \
                    if self.method == "chainq" else Q
                return pq_mod.sharded_linscan_lsq(
                    mesh, B, Qr, model.C, self._dbn, k)
            R = model.R if self.method == "opq" else None
            return pq_mod.sharded_linscan_pq(
                mesh, B, Q, model.C_sub, k, R=R, extra=self._extra)
        if self.additive:
            R = np.asarray(model.R) if self.method == "chainq" else None
            return adc.linscan_lsq(self.B, Q, model.C, self._dbn, k=k, R=R)
        if self.method == "opq":
            return adc.linscan_opq(self.B, Q, model.C_sub, model.R, k=k,
                                   extra=self._extra)
        return adc.linscan_pq(self.B, Q, model.C_sub, k=k,
                              extra=self._extra)

    def add(self, X) -> list[int]:
        """Encode X with the frozen model and append; returns assigned ids.

        Batches pad to the next power of two so repeated adds reuse a few
        compiled encode programs instead of one per distinct batch size.
        """
        import jax

        X = np.asarray(X, np.float32)
        if X.ndim != 2 or X.shape[1] != self.d:
            raise ValueError(f"vectors must be [n, {self.d}], got {X.shape}")
        nreal = X.shape[0]
        p = 8
        while p < nreal:
            p *= 2
        Xp = X if p == nreal else np.concatenate(
            [X, np.repeat(X[:1], p - nreal, axis=0)])
        model = self.model
        if self.method == "pq":
            from local_search_quantization_tpu.models.pq import quantize_pq

            Bn = np.asarray(quantize_pq(Xp, model.C_sub))
        elif self.method == "opq":
            from local_search_quantization_tpu.models.opq import quantize_opq

            Bn = np.asarray(quantize_opq(Xp, model.R, model.C_sub))
        elif self.method == "chainq":
            from local_search_quantization_tpu.ops import viterbi

            Bn = np.asarray(viterbi.viterbi_encode(
                Xp @ np.asarray(model.R, np.float32), model.C))
        else:  # lsq: ILS from random codes at the build's round count
            from local_search_quantization_tpu.ops import icm
            from local_search_quantization_tpu.utils.synth import random_codes

            m, h = self.meta["m"], self.meta["h"]
            B0 = random_codes(0, Xp.shape[0], m, h)
            enc = icm.ils_encode(
                jax.random.PRNGKey(self.n), Xp, B0, model.C,
                ilsiter=self.meta.get("ilsiter") or 16, icmiter=4,
                npert=min(4, m), randord=True)
            Bn = np.asarray(enc.B)
        Bn = Bn[:nreal]
        n0 = self.n
        if self.additive:
            from local_search_quantization_tpu.ops import norms

            bn = np.asarray(norms.quantize_norms(Bn, model.C, self._cbnorms))
            self._bnorm = np.concatenate([self._bnorm, bn])
            self._dbn = np.concatenate([self._dbn, self._cbnorms[bn]])
        elif self._extra is not None:
            self._extra = np.concatenate(
                [self._extra, np.zeros(nreal, np.float32)])
        self._tomb = np.concatenate([self._tomb, np.zeros(nreal, bool)])
        self.B = np.concatenate([self.B, Bn.astype(self.B.dtype)])
        return list(range(n0, n0 + nreal))

    def delete(self, ids) -> int:
        """Tombstone rows in O(1): their distance term becomes +inf, so no
        scanner can return them; ids stay stable."""
        ids = np.asarray(ids, np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= self.n):
            raise ValueError(f"delete ids out of range [0, {self.n})")
        self._tomb[ids] = True
        if self.additive:
            self._dbn[ids] = np.inf
        else:
            if self._extra is None:
                self._extra = np.zeros(self.n, np.float32)
            self._extra[ids] = np.inf
        return int(ids.size)

    def compact(self) -> np.ndarray:
        """Drop tombstoned rows, renumbering the survivors densely.

        Returns old_of_new [active] int64 — old_of_new[j] is the previous
        id of the row now serving as id j (the caller's handle for
        remapping any external id references). Frees the tombstones'
        memory and scan work; ids are NOT stable across a compact.
        """
        keep = ~self._tomb
        old_of_new = np.flatnonzero(keep)
        self.B = np.ascontiguousarray(self.B[keep])
        if self.additive:
            self._bnorm = self._bnorm[keep]
            self._dbn = np.ascontiguousarray(self._dbn[keep])
        else:
            self._extra = None  # all survivors are live: no carrier needed
        self._tomb = np.zeros(self.B.shape[0], bool)
        self.meta["n"] = self.n
        return old_of_new

"""Late-interaction retrieval index: build once, two-stage search.

The model's entire point is ColBERT-style late-interaction retrieval, but
the reference ships no retrieval index — its eval path scores a dense
[num_images, num_texts] matrix per suite (reference train.py:510-585),
which cannot serve a corpus. This module adds the standard two-stage
serving pattern:

  stage 1  pooled-feature dot product over the WHOLE corpus (the plain
           CLIP global score — one [D] x [N, D] matvec per query)
           -> top-``shortlist`` candidate ids
  stage 2  exact MaxSim rerank of the shortlist with stored token
           features (ops/maxsim.py — identical semantics to training,
           reference loss.py:20-46)

Stage 1 is a cheap, high-recall filter (global and token scores correlate
by construction: both towers are trained jointly); stage 2 restores the
exact late-interaction order where it matters — the top of the ranking.
``shortlist >= corpus size`` degrades gracefully to exact brute force.

Index layout (``index_dir/``):

  meta.json    {"embed_dim", "token_len", "num_items", "ids", "model",
                "logit_scale", "dtype"}
  pooled.npy   [N, D]      l2-normalized pooled features
  tokens.npy   [N, Li, D]  token-head features

Both arrays are standard ``.npy`` so ``RetrievalIndex`` opens them with
``mmap_mode='r'`` — a million-image ViT-B index (~400 MB pooled + ~80 GB
fp16 tokens) costs no resident RAM until rows are touched, and stage 2
touches only ``shortlist`` rows per query.
"""
from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

_META = "meta.json"
_POOLED = "pooled.npy"
_TOKENS = "tokens.npy"


class IndexWriter:
    """Accumulate (pooled, tokens) batches, then write one index dir.

    Batches are held as fp16 chunks until ``finalize`` (a 100k-image ViT-B
    corpus is ~2 GB of fp16 tokens — fine for a build host; shard the corpus
    across several index dirs beyond that).
    """

    def __init__(self, out_dir: str, *, model: str = "",
                 logit_scale: float = 100.0, dtype: str = "float16"):
        self.out_dir = out_dir
        self.model = model
        self.logit_scale = float(logit_scale)
        self.dtype = np.dtype(dtype)
        self._pooled: List[np.ndarray] = []
        self._tokens: List[np.ndarray] = []
        self._ids: List = []

    def add(self, pooled: np.ndarray, tokens: np.ndarray,
            ids: Optional[Sequence] = None) -> None:
        pooled = np.asarray(pooled)
        tokens = np.asarray(tokens)
        if pooled.ndim != 2 or tokens.ndim != 3 or len(pooled) != len(tokens):
            raise ValueError(
                f"expected pooled [n, D] and tokens [n, Li, D], got "
                f"{pooled.shape} / {tokens.shape}")
        self._pooled.append(pooled.astype(self.dtype))
        self._tokens.append(tokens.astype(self.dtype))
        if ids is not None:
            if len(ids) != len(pooled):
                raise ValueError("ids length != batch length")
            self._ids.extend(ids)

    def finalize(self) -> str:
        if not self._pooled:
            raise ValueError("empty index")
        if self._ids and len(self._ids) != sum(len(p) for p in self._pooled):
            raise ValueError("ids were provided for only some batches")
        os.makedirs(self.out_dir, exist_ok=True)
        pooled = np.concatenate(self._pooled)
        tokens = np.concatenate(self._tokens)
        np.save(os.path.join(self.out_dir, _POOLED), pooled)
        np.save(os.path.join(self.out_dir, _TOKENS), tokens)
        meta = {
            "embed_dim": int(pooled.shape[1]),
            "token_len": int(tokens.shape[1]),
            "num_items": int(pooled.shape[0]),
            "ids": list(self._ids) if self._ids else None,
            "model": self.model,
            "logit_scale": self.logit_scale,
            "dtype": self.dtype.name,
        }
        with open(os.path.join(self.out_dir, _META), "w") as f:
            json.dump(meta, f)
        return self.out_dir


def build_image_index(
    model,
    params,
    images: Iterable[np.ndarray],
    out_dir: str,
    *,
    ids: Optional[Sequence] = None,
    batch_size: int = 256,
    model_name: str = "",
) -> str:
    """Encode an image iterable through the vision tower and write an index.

    ``images``: yields [H, W, 3] float32 preprocessed arrays (the eval
    transform's output). Uses the local-device-sharded Encoder batching.
    """
    import jax

    from ..training.evaluate import _pad_batch, local_shard_scheme

    ship, params_on_mesh, n_dev = local_shard_scheme(params)
    batch_size = -(-batch_size // n_dev) * n_dev

    @jax.jit
    def encode(p, x):
        return model.apply(
            p, x, method=lambda m, image: m.encode_image(image, normalize=True)
        )

    ls = float(np.exp(np.asarray(params["params"]["logit_scale"])))
    writer = IndexWriter(out_dir, model=model_name, logit_scale=ls)
    buf: List[np.ndarray] = []

    def flush():
        if not buf:
            return
        batch, n = _pad_batch(np.stack(buf), batch_size)
        out = encode(params_on_mesh, ship(batch))
        pooled, tokens = (out if isinstance(out, tuple) else (out, None))
        if tokens is None:
            raise ValueError("model has no token outputs — build the index "
                             "with a colxlip model (token head required)")
        writer.add(np.asarray(pooled[:n], np.float32),
                   np.asarray(tokens[:n], np.float32))
        buf.clear()

    for img in images:
        buf.append(np.asarray(img))
        if len(buf) == batch_size:
            flush()
    flush()
    if ids is not None:
        writer._ids = list(ids)
    return writer.finalize()


class RetrievalIndex:
    """Memory-mapped two-stage (global shortlist -> MaxSim rerank) search."""

    def __init__(self, index_dir: str):
        with open(os.path.join(index_dir, _META)) as f:
            self.meta = json.load(f)
        self.pooled = np.load(os.path.join(index_dir, _POOLED), mmap_mode="r")
        self.tokens = np.load(os.path.join(index_dir, _TOKENS), mmap_mode="r")
        self.ids = self.meta.get("ids")
        self.logit_scale = float(self.meta.get("logit_scale", 100.0))
        if self.pooled.shape[0] != self.tokens.shape[0]:
            raise ValueError("corrupt index: pooled/tokens row mismatch")
        # stage 1 runs as one [N, D] fp32 matmul per query wave; keep a
        # dense fp32 copy only when it is small, else matmul the fp16 mmap
        self._pooled_f32 = (np.asarray(self.pooled, np.float32)
                            if self.pooled.nbytes <= 256 * 1024 * 1024
                            else None)

    def __len__(self) -> int:
        return int(self.meta["num_items"])

    def search(
        self,
        query_pooled: np.ndarray,
        query_tokens: Optional[np.ndarray] = None,
        *,
        k: int = 10,
        shortlist: int = 100,
        scoring: str = "maxsim",
        alpha: float = 0.5,
        mask_mode: str = "nonzero",
        text_mask: Optional[np.ndarray] = None,
        maxsim_impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray, Optional[List]]:
        """[M, D] queries (+ [M, Lt, D] token features for maxsim/mixed)
        -> (indices [M, k], scores [M, k], ids [M][k] or None).

        scoring='global' ranks by stage 1 alone; 'maxsim'/'mixed' rerank the
        stage-1 shortlist with exact late interaction (score values match
        ``training/evaluate.score_similarity`` on the same candidates).
        """
        from ..ops.maxsim import maxsim as maxsim_op

        q = np.asarray(query_pooled, np.float32)
        if q.ndim != 2:
            raise ValueError(f"query_pooled must be [M, D], got {q.shape}")
        n = len(self)
        k = min(k, n)
        shortlist = min(max(shortlist, k), n)
        base = (self._pooled_f32 if self._pooled_f32 is not None
                else np.asarray(self.pooled, np.float32))
        g = self.logit_scale * (q @ base.T)  # [M, N]

        if scoring == "global":
            top = np.argpartition(-g, k - 1, axis=1)[:, :k]
            scores = np.take_along_axis(g, top, axis=1)
            order = np.argsort(-scores, axis=1)
            top = np.take_along_axis(top, order, axis=1)
            scores = np.take_along_axis(scores, order, axis=1)
            return top, scores, self._resolve(top)

        if scoring not in ("maxsim", "mixed"):
            raise ValueError(f"unknown scoring: {scoring!r}")
        if query_tokens is None:
            raise ValueError(f"scoring={scoring!r} needs query_tokens")
        qt = np.asarray(query_tokens, np.float32)

        cand = np.argpartition(-g, shortlist - 1, axis=1)[:, :shortlist]
        out_idx = np.empty((len(q), k), np.int64)
        out_scores = np.empty((len(q), k), np.float32)
        for m in range(len(q)):
            rows = np.sort(cand[m])  # sorted rows read faster off the mmap
            cand_tokens = np.asarray(self.tokens[rows], np.float32)
            tm = None if text_mask is None else text_mask[m:m + 1]
            s_tok = np.asarray(maxsim_op(
                qt[m:m + 1], cand_tokens, mask_mode=mask_mode,
                text_mask=tm, impl=maxsim_impl,
            ))[0]  # [shortlist]
            s = self.logit_scale * s_tok
            if scoring == "mixed":
                s = alpha * g[m, rows] + (1 - alpha) * s
            order = np.argsort(-s)[:k]
            out_idx[m] = rows[order]
            out_scores[m] = s[order]
        return out_idx, out_scores, self._resolve(out_idx)

    def _resolve(self, idx: np.ndarray) -> Optional[List]:
        if self.ids is None:
            return None
        return [[self.ids[int(i)] for i in row] for row in idx]

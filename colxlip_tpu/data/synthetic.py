"""Synthetic in-memory dataset for smoke tests and benchmarks.

The reference accepts ``--dataset-type synthetic`` but lost the builder in the
fork (SURVEY.md §4 item 2; main.py:277, data.py:185-189 only supports
webdataset). Here it is a first-class component: deterministic, infinite,
shaped exactly like the WebDataset pipeline's output, so the full train loop
runs with zero real data.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Tuple

import numpy as np


@dataclasses.dataclass
class SyntheticConfig:
    batch_size: int = 64
    image_size: Tuple[int, int] = (224, 224)
    context_length: int = 77
    num_sampled_captions: int = 1
    vocab_size: int = 49408
    sot_token: int = 49406
    eot_token: int = 49407
    seed: int = 0
    num_samples: int = 100_000  # nominal epoch size


class SyntheticDataset:
    """Yields (images [B,H,W,3] f32, texts [B,k,ctx] i32) batches."""

    def __init__(self, cfg: SyntheticConfig):
        self.cfg = cfg
        self.num_batches = max(1, cfg.num_samples // cfg.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        h, w = cfg.image_size
        for _ in range(self.num_batches):
            images = rng.standard_normal((cfg.batch_size, h, w, 3), dtype=np.float32)
            texts = np.zeros(
                (cfg.batch_size, cfg.num_sampled_captions, cfg.context_length), np.int32
            )
            lengths = rng.integers(3, cfg.context_length - 1, cfg.batch_size)
            body = rng.integers(1, cfg.sot_token, texts.shape)
            for b in range(cfg.batch_size):
                texts[b, :, 1:lengths[b]] = body[b, :, 1:lengths[b]]
                texts[b, :, 0] = cfg.sot_token
                texts[b, :, lengths[b]] = cfg.eot_token
            yield images, texts

    def __len__(self) -> int:
        return self.num_batches

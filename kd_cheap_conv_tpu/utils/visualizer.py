"""Visualization / observability (SURVEY.md §2.4/§5.5).

The reference uses visdom live plots plus PNG dumps of val predictions
(`save_val_results`: image/target/pred/overlay). Here: TensorBoard scalars
(tensorboardX if importable, else a JSONL fallback — nothing to install
offline) and the same PNG triplet dumps via PIL.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class Visualizer:
    """Scalar logger: TensorBoard when available, JSONL always."""

    def __init__(self, logdir: str = "runs", enable: bool = True):
        self.enable = enable
        self.logdir = logdir
        self._tb = None
        self._jsonl = None
        if not enable:
            return
        os.makedirs(logdir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if not self.enable:
            return
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value),
                 "step": int(step)}) + "\n")
            self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


def save_val_results(out_dir: str, idx: int, image: np.ndarray,
                     target: np.ndarray, pred: np.ndarray, decode_fn,
                     mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)
                     ) -> None:
    """Reference save_val_results: write image/target/pred/overlay PNGs."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    img = (np.asarray(image) * np.asarray(std) + np.asarray(mean))
    img = np.clip(img * 255, 0, 255).astype(np.uint8)
    tgt = decode_fn(target).astype(np.uint8)
    prd = decode_fn(pred).astype(np.uint8)
    overlay = (0.7 * img + 0.3 * prd).astype(np.uint8)
    Image.fromarray(img).save(os.path.join(out_dir, f"{idx}_image.png"))
    Image.fromarray(tgt).save(os.path.join(out_dir, f"{idx}_target.png"))
    Image.fromarray(prd).save(os.path.join(out_dir, f"{idx}_pred.png"))
    Image.fromarray(overlay).save(os.path.join(out_dir, f"{idx}_overlay.png"))


def denormalize(image: np.ndarray, mean=(0.485, 0.456, 0.406),
                std=(0.229, 0.224, 0.225)) -> np.ndarray:
    """Reference utils.denormalize (HWC)."""
    return np.asarray(image) * np.asarray(std) + np.asarray(mean)

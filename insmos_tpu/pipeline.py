"""Streaming inference pipeline.

One jitted forward serves every window size: the sample layout always has
n_past_steps slots and a shorter (warm-up) window fills the last n slots
(data/sample.py), so the reference's per-window-size dataset + model
rebuild loop (scripts/predict_mos.py:305-383) collapses into a single
compiled graph processing a sliding deque of scans.
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import jax
import numpy as np

from .config import Config
from .data.sample import make_window_sample
from .nn.model import InsMOSModel


class InferencePipeline:
    def __init__(self, cfg: Config, params, state):
        self.cfg = cfg
        self.model = InsMOSModel(cfg)
        self.params = params
        self.state = state
        self._fwd = jax.jit(
            lambda p, s, x: self._outputs(self.model.forward(p, s, x, train=False))
        )

    @staticmethod
    def _outputs(out):
        return {
            "point_logits": out["point_logits"],
            "boxes": out["boxes"],
            "scores": out["scores"],
            "labels": out["labels"],
            "box_mask": out["box_mask"],
        }

    def infer_window(self, scans: list[np.ndarray]) -> dict[str, np.ndarray]:
        """scans: pose-aligned (N_i, 4) clouds, oldest..current.

        Returns host arrays: point_logits trimmed to the raw current-scan
        size, plus boxes/scores/labels trimmed to the NMS-kept count.
        """
        cap = self.cfg.runtime.max_points_per_scan
        n_raw = len(scans[-1])
        assert n_raw <= cap, f"scan has {n_raw} points > capacity {cap}"
        sample = make_window_sample(
            scans, capacity=cap, window=self.cfg.model.n_past_steps
        )
        out = self._fwd(self.params, self.state, sample.arrays())
        out = jax.tree.map(np.asarray, out)
        kept = out["box_mask"].astype(bool)
        return {
            "point_logits": out["point_logits"][:n_raw],
            "boxes": out["boxes"][kept][:, :7],
            "scores": out["scores"][kept],
            "labels": out["labels"][kept],
        }

    def stream_sequence(
        self, scan_iter: Iterator[np.ndarray], poses: np.ndarray | None
    ) -> Iterator[dict[str, np.ndarray]]:
        """Yield per-scan outputs over a whole sequence, including the
        growing-window warm-up for the first n_past_steps-1 scans."""
        W = self.cfg.model.n_past_steps
        window: deque[np.ndarray] = deque(maxlen=W)
        for idx, scan in enumerate(scan_iter):
            window.append(scan)
            if poses is not None:
                aligned = []
                to_pose = poses[idx]
                inv_to = np.linalg.inv(to_pose)
                for j, pts in enumerate(window):
                    tf = inv_to @ poses[idx - len(window) + 1 + j]
                    out = pts.copy()
                    out[:, :3] = pts[:, :3] @ tf[:3, :3].T + tf[:3, 3]
                    aligned.append(out)
            else:
                aligned = list(window)
            yield self.infer_window(aligned)

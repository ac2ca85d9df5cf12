"""Scalar/image metrics writer (reference: tf.summary.* — SURVEY.md §5).

Always writes machine-readable JSONL (``metrics.jsonl``); additionally
writes TensorBoard event files when TensorFlow is importable (it is an
oracle-only dependency here, so the import is guarded and lazy).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 enabled: bool = True):
        # enabled=False (non-primary hosts): a no-op writer so only host 0
        # holds the metrics.jsonl handle on multi-process runs
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                           encoding="utf-8")
        if use_tensorboard:
            try:
                import tensorflow as tf  # oracle-only dep; may be absent
                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb"))
            except Exception:
                self._tb = None

    def scalars(self, step: int, values: dict[str, Any]) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=int(step))
                self._tb.flush()

    def image(self, step: int, tag: str, image_path: str) -> None:
        """Log an already-rendered PNG (alignment plots) to TensorBoard."""
        if self._tb is None or not os.path.exists(image_path):
            return
        import tensorflow as tf
        data = tf.io.read_file(image_path)
        img = tf.image.decode_png(data)[None]
        with self._tb.as_default():
            tf.summary.image(tag, img, step=int(step))
            self._tb.flush()

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()

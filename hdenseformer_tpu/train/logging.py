"""Training observability: tensorboard scalars + JSONL mirror.

Equivalent of the reference's tensorboardX usage (trainer.py:293-307,
411-414) with the same tag names, plus a machine-readable JSONL mirror so
runs are inspectable without tensorboard.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()})
            + "\n"
        )
        self._jsonl.flush()

    def add_scalars(self, tag: str, values: Dict[str, float], step: int) -> None:
        if self._tb is not None:
            self._tb.add_scalars(tag, values, step)
        for k, v in values.items():
            self._jsonl.write(
                json.dumps(
                    {"tag": f"{tag}/{k}", "value": float(v), "step": int(step), "t": time.time()}
                )
                + "\n"
            )
        self._jsonl.flush()

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        self._jsonl.close()

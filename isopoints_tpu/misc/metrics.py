"""Scalar metrics logging.

Parity: the reference logs per-loss scalars + lr to TensorBoard
(trainer.py:113-114,500-505,747). Here: an append-only JSONL stream
(one object per step — trivially greppable/plottable, no TB
dependency) plus an in-memory history for quick plotting via
scripts/plot_evaluations.py.
"""

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    """Append-only JSONL scalar logger."""

    def __init__(self, out_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self.history = []

    def log(self, it: int, metrics: Dict[str, float],
            prefix: str = "") -> None:
        row = {"it": int(it), "ts": time.time()}
        for k, v in metrics.items():
            try:
                row[prefix + k] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self.history.append(row)

    def close(self) -> None:
        self._f.close()


def load_metrics(path: str):
    """Read a metrics.jsonl back into a list of dicts."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows

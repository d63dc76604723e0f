"""Structured run logging: console + JSONL metrics + run-dir layout.

Mirrors the lineage's `log/<task>/<timestamp>/{checkpoints,logs}` output
tree (SURVEY.md §1 L4) with machine-readable JSONL instead of
string-formatted text files.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import sys
from typing import Optional


def create_run_dir(root: str, task: str, name: Optional[str] = None) -> str:
    ts = name or datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run_dir = os.path.join(root, task, ts)
    os.makedirs(os.path.join(run_dir, "checkpoints"), exist_ok=True)
    os.makedirs(os.path.join(run_dir, "logs"), exist_ok=True)
    return run_dir


class MetricsLogger:
    """Console logger + append-only metrics.jsonl."""

    def __init__(self, run_dir: str, name: str = "mm3d"):
        self.run_dir = run_dir
        self._jsonl = open(
            os.path.join(run_dir, "logs", "metrics.jsonl"), "a")
        self.logger = logging.getLogger(f"{name}:{run_dir}")
        self.logger.setLevel(logging.INFO)
        self.logger.propagate = False
        if not self.logger.handlers:
            fh = logging.FileHandler(
                os.path.join(run_dir, "logs", "train.log"))
            sh = logging.StreamHandler(sys.stdout)
            fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            fh.setFormatter(fmt)
            sh.setFormatter(fmt)
            self.logger.addHandler(fh)
            self.logger.addHandler(sh)

    def info(self, msg: str, *args):
        self.logger.info(msg, *args)

    def log_metrics(self, step: int, metrics: dict, prefix: str = ""):
        rec = {"step": int(step)}
        rec.update({(f"{prefix}{k}"): (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        pretty = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in rec.items() if k != "step")
        self.logger.info("step %d %s", step, pretty)

    def close(self):
        self._jsonl.close()

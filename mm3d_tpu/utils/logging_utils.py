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
    if name is None:
        # auto-stamped dirs must be UNIQUE: the stamp has 1s granularity
        # and two same-second launches would silently interleave logs
        # and checkpoints in one dir (code-review r5).  An explicit name
        # keeps exist_ok semantics — that is how --resume finds its run.
        ts = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        cand, i = ts, 1
        while os.path.exists(os.path.join(root, task, cand)):
            i += 1
            cand = f"{ts}_{i}"
        name = cand
    run_dir = os.path.join(root, task, name)
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

    @staticmethod
    def _jsonable(v):
        # keep python ints/bools as-is; unwrap 1-element arrays; list-ify
        # bigger arrays (ndarray.__float__ raises on size != 1 and the
        # old blanket float() rewrote ints/bools — code-review r5)
        if isinstance(v, (bool, int, float, str)) or v is None:
            return v
        if hasattr(v, "size") and getattr(v, "size") != 1 \
                and hasattr(v, "tolist"):
            return v.tolist()
        if hasattr(v, "item"):
            return v.item()
        return float(v)

    def log_metrics(self, step: int, metrics: dict, prefix: str = ""):
        rec = {"step": int(step)}
        rec.update({f"{prefix}{k}": self._jsonable(v)
                    for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        pretty = " ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                          for k, v in rec.items() if k != "step")
        self.logger.info("step %d %s", step, pretty)

    def close(self):
        """Release the jsonl fd AND the logging handlers: the per-run
        logger is registered globally, so without handler removal every
        run leaks 3 fds for the process lifetime (code-review r5)."""
        self._jsonl.close()
        for h in list(self.logger.handlers):
            self.logger.removeHandler(h)
            h.close()

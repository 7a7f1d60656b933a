"""Experiment logging: JSONL always, wandb when available.

The reference logs to wandb (project='HiCDiff', train.py:62-64,187); this image has
no wandb, so the primary sink is an append-only JSONL file (machine-readable, no
cloud dependency) with the same keys, and wandb is used opportunistically when
importable and configured.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, out_path: Optional[str] = None, run_name: str = "hicdiff",
                 use_wandb: bool = True, project: str = "HiCDiff"):
        self.out_path = out_path
        self.run_name = run_name
        self._fh = None
        if out_path:
            os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
            self._fh = open(out_path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: PLC0415

                self._wandb = wandb
                wandb.init(project=project)
                wandb.run.name = run_name
                wandb.run.save()
            except Exception:
                self._wandb = None

    def log(self, metrics: dict):
        rec = {"ts": time.time(), "run": self.run_name, **metrics}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics)

    def close(self):
        if self._fh:
            self._fh.close()

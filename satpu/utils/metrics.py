"""Training metrics / observability shared by all trainers.

The reference mirrors everything into tensorboard (chain/tensorboard.py:7-34,
hifigan/model.py:433-531, sidekit/monitor.py, utils/tensorboard_log.py). satpu
writes an append-only ``metrics.jsonl`` per experiment dir — one JSON object
per event with a wall-clock timestamp, a step counter, and arbitrary scalar
fields — which tensorboard/pandas/jq can all consume, plus an optional
``jax.profiler`` trace hook for per-step device profiles (SURVEY.md §5.1).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsWriter:
    """Append-only JSONL scalar logger, one file per experiment dir.

    Mirrors the role of the reference's SummaryWriter wiring; ``global_step``
    persists across resumes like chain/tensorboard.py:20-31.
    """

    def __init__(self, exp_dir: str, name: str = "metrics.jsonl"):
        os.makedirs(exp_dir, exist_ok=True)
        self.path = os.path.join(exp_dir, name)
        self._fh = open(self.path, "a", buffering=1)

    def write(self, step: int, tag_or_scalars, value: Optional[float] = None,
              **extra: Any) -> None:
        """write(step, "loss", 1.3) or write(step, {"loss": 1.3, "lr": 2e-4})."""
        if isinstance(tag_or_scalars, str):
            scalars: Dict[str, Any] = {tag_or_scalars: value}
        else:
            scalars = dict(tag_or_scalars)
        rec = {"t": round(time.time(), 3), "step": int(step)}
        for k, v in {**scalars, **extra}.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._fh.write(json.dumps(rec) + "\n")

    def close(self) -> None:
        self._fh.close()


def profile_steps(exp_dir: str, enabled: bool = None):
    """Context manager: capture a jax.profiler device trace into
    ``exp_dir/profile`` when enabled (or SATPU_PROFILE=1)."""
    import contextlib

    if enabled is None:
        enabled = os.environ.get("SATPU_PROFILE", "") == "1"
    if not enabled:
        return contextlib.nullcontext()
    import jax

    return jax.profiler.trace(os.path.join(exp_dir, "profile"))

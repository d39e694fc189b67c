"""Metrics / observability.

Per-timestep metrics writer mirroring the reference's tensorboardX usage (a
fresh writer per timestep named t{NNN}, scalars each iteration, figures at
vis_frequency — reference: base/baseModel.py:64-71,118,122-124). Primary sink
is JSONL (always available, cheap); tensorboard via torch.utils.tensorboard is
attached opportunistically when requested.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Dict


class MetricsWriter:
    def __init__(self, log_path: str, overwrite: bool = True,
                 write_tb: bool = False):
        self.log_path = log_path
        if os.path.exists(log_path) and overwrite:
            shutil.rmtree(log_path, ignore_errors=True)
        os.makedirs(log_path, exist_ok=True)
        self._f = open(os.path.join(log_path, "scalars.jsonl"), "a", buffering=1)
        self._tb = None
        if write_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_path)
            except Exception:
                self._tb = None

    def add_scalars(self, tag: str, values: Dict[str, float], global_step: int):
        rec = {"tag": tag, "step": global_step, "t": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(tag, {k: float(v) for k, v in values.items()},
                                 global_step=global_step)

    def add_figure(self, tag: str, fig, global_step: int):
        fig_dir = os.path.join(self.log_path, "figures")
        os.makedirs(fig_dir, exist_ok=True)
        fig.savefig(os.path.join(fig_dir, f"{tag}_{global_step:06d}.png"),
                    dpi=100)
        if self._tb is not None:
            self._tb.add_figure(tag, fig, global_step=global_step)
        import matplotlib.pyplot as plt
        plt.close(fig)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()

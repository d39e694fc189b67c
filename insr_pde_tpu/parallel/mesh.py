"""Device mesh construction for collocation-point sharding.

The reference is single-GPU (hard-coded cuda:0, base/baseModel.py:25); the
idiomatic TPU parallelization for INR-PDE workloads is a 1-D mesh over which
each Adam iteration's Monte-Carlo collocation batch is sharded (per-device RNG
fold-in) with loss/grad pmean over ICI — the workload's analogue of DP/SP
(SURVEY.md §2.13, §5). Params stay replicated (they are tiny SIREN MLPs).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int = 0, axis: str = "data") -> Optional[Mesh]:
    """Build a 1-D device mesh.

    n_devices: 0 = all local devices; 1 = single-chip (returns None: no
    sharding machinery needed); k = first k devices.
    """
    devices = jax.devices()
    if n_devices == 0:
        n_devices = len(devices)
    if n_devices <= 1:
        return None
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis,))

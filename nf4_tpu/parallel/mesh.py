"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(
    tp: Optional[int] = None,
    dp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "tp") mesh.  ``tp`` defaults to all devices / dp."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    assert dp * tp <= len(devices), f"need {dp * tp} devices, have {len(devices)}"
    import numpy as np

    grid = np.asarray(devices[: dp * tp], dtype=object).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))

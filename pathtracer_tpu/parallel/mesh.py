"""Device mesh construction."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, spp_parallel: bool = True) -> Tuple[int, int]:
    """Factor n devices into (pixels, spp) axes. Prefers sample-axis
    parallelism of 2 when the count allows, pixels otherwise."""
    if spp_parallel and n_devices % 2 == 0 and n_devices > 1:
        return (n_devices // 2, 2)
    return (n_devices, 1)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("pixels", "spp"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = mesh_shape_for(len(devices))
    assert shape[0] * shape[1] == len(devices), (shape, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)

"""Multi-host initialization and pod-slice mesh construction.

The reference has no inter-device story at all (SURVEY.md §2.3: its whole
"communication backend" is single-device OpenCL queue traffic). The
TPU-native equivalent: `jax.distributed.initialize` across hosts, one
global Mesh over every chip in the slice, scene arrays replicated, pixels
sharded, psum over ICI for sample partials and gradients (render_dist.py,
diff/grad.py). DCN only carries the initial rendezvous and the final
host gather.
"""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax

from .mesh import make_mesh

log = logging.getLogger("pathtracer_tpu")


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax.distributed cluster. On TPU pod slices all arguments
    auto-detect from the environment; pass them explicitly elsewhere.
    Safe to call once per process, before any backend use."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def global_render_mesh(shape: Optional[Tuple[int, int]] = None):
    """Mesh over every chip in the slice (call initialize_multihost first
    on multi-host). Axes ('pixels', 'spp'); ICI carries the spp psum."""
    return make_mesh(jax.devices(), shape=shape)

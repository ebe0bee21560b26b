"""Mesh helpers for the distributed (ICI) paths.

The reference has no distributed code at all (single process, single GPU,
jobfile:4-6); the TPU build scales over a jax.sharding.Mesh with XLA
collectives riding ICI.  Tests exercise these on a virtual CPU mesh
(xla_force_host_platform_device_count), the same validation trick SURVEY.md
S4 prescribes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def row_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the row (m) axis -- the TSQR/CAQR reduction axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

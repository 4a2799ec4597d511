"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    """Build a 1-D mesh over ``n_devices`` devices.

    Prefers the default backend; if it cannot supply ``n_devices`` devices
    (e.g. single real TPU chip while a virtual 8-device CPU mesh was
    requested), falls back to the CPU backend, which honors
    ``--xla_force_host_platform_device_count``.
    """
    devs = jax.devices()
    if n_devices is not None and len(devs) < n_devices:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n_devices:
            devs = cpu
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} mesh devices but only {len(devs)} "
                "available on any backend"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def obs_sharding(mesh: Mesh, axis: str = "obs") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Device mesh construction helpers."""

from __future__ import annotations

import typing as T

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    shape: T.Optional[T.Tuple[int, ...]] = None,
    axis_names: T.Tuple[str, ...] = ("data", "model"),
    devices: T.Optional[T.Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over the available devices.

    With shape=None, all devices go on the first axis (pure data parallel).
    Axis sizes must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def factor_mesh_shape(n: int, num_axes: int) -> T.Tuple[int, ...]:
    """Greedy near-balanced factorization of n devices into num_axes axes
    (e.g. 8, 3 -> (2, 2, 2); 4, 2 -> (2, 2); 6, 2 -> (2, 3))."""
    shape = [1] * num_axes
    remaining = n
    axis = 0
    f = 2
    while remaining > 1:
        while remaining % f != 0:
            f += 1
        shape[axis % num_axes] *= f
        remaining //= f
        axis += 1
    return tuple(shape)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))

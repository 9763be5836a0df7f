"""Device mesh + spatial sharding: the TPU-native replacement for the
reference's multi-process per-GPU layer-split parallelism.

The reference partitions VGG layer ranges across one OS process per GPU and
relays activations/gradients over host-mediated multiprocessing IPC, summing
per-device loss-gradient contributions into one image gradient (SURVEY.md
section 2 rows 10-11, reconstructed). On TPU the idiomatic equivalent is
single-process SPMD: a 1-D ``jax.sharding.Mesh`` over the slice, the image
and every activation sharded along the image height axis, VGG weights
replicated, and XLA's SPMD partitioner inserting the halo exchanges for the
3x3 convs and the ``psum`` of Gram/gradient contributions over ICI — the
collectives ride the interconnect instead of host RAM.

We deliberately use ``jit`` + sharding annotations (not hand-written
``shard_map`` halos): XLA's spatial partitioner already emits the minimal
``ppermute`` halo exchanges for convolutions, which is exactly the
"measure before hand-rolling" path SURVEY.md section 7 phase 4 prescribes.
Sharded and unsharded objectives are verified equal in tests on a forced
8-device CPU mesh (SURVEY.md section 4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "space"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D mesh over ``n_devices`` (default: all visible devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(f"asked for {n_devices} devices, have {len(devices)}")
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SPATIAL_AXIS,))


def image_spec() -> P:
    """NHWC image/activation sharding: split H across the mesh."""
    return P(None, SPATIAL_AXIS, None, None)


def image_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, image_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_image(image, mesh: Optional[Mesh]):
    """Place an NHWC image sharded along H (no-op without a mesh)."""
    if mesh is None:
        return image
    return jax.device_put(image, image_sharding(mesh))


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (weights, Gram targets) across the mesh."""
    if mesh is None:
        return tree
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def constrain_spatial(x, mesh: Optional[Mesh]):
    """Pin an NHWC array's sharding inside a jitted computation."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, image_sharding(mesh))

"""Device-mesh parallelism: the TPU replacement for the pthread pool.

The reference's only parallelism is a shared-memory task queue
(reference core/parallel.cpp:722-879, SURVEY.md section 2.4). The
TPU-native equivalents:

- pixel/ray tiles   -> batch axis sharded over a 1D "rays" mesh via
                       shard_map (the analog of SamplerRendererTask
                       fan-out, samplerrenderer.cpp:205-217)
- photon batches    -> shot sharded, maps all_gather-ed (the analog of
                       the photon-merge mutex, photonshooter.cpp:280)
- film accumulation -> per-device accumulators + psum (the analog of
                       the film's atomic float adds, image.cpp:130)
- gradients         -> psum over the mesh inside the backward pass

All collectives ride ICI by construction (one mesh axis, no host
round-trips inside the step).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def mesh_from_options(options: Optional[dict] = None) -> Optional[Mesh]:
    """The render/shoot mesh implied by CLI options: --ncores devices
    (0 = all). None on a single device — callers fall through to the
    unsharded path."""
    options = options or {}
    avail = len(jax.devices())
    n = int(options.get("nCores") or 0) or avail
    n = max(1, min(n, avail))
    return make_mesh(n) if n > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the leading (ray/sample/photon) batch axis."""
    return NamedSharding(mesh, P(AXIS))


def shard_batch(mesh: Mesh, arr):
    """Shard the leading axis of a ray/sample batch over the mesh."""
    return jax.device_put(arr, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_render(mesh: Mesh, li_fn, ray, pixel, sidx, seed: int):
    """Run a wavefront li over the mesh: rays sharded, output sharded.

    li_fn must be shard-oblivious (pure elementwise over the batch),
    which every integrator in pbrt_tpu.integrators is — scene tensors
    are closed over (replicated), ray state is the only sharded input.
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        lambda o, d, tmin, tmax, time, pix, si: li_fn(
            type(ray)(o, d, tmin, tmax, time), pix, si, seed
        ),
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS),
    )
    return fn(ray.o, ray.d, ray.tmin, ray.tmax, ray.time, pixel, sidx)


def psum_film(mesh: Mesh, xyz_partial):
    """Reduce per-device film accumulators (inside shard_map bodies)."""
    return jax.lax.psum(xyz_partial, AXIS)

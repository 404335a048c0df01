"""Multi-chip rendering via jax.sharding (SURVEY.md §2.10, §5.8).

The reference's only parallelism is shared-memory threads + atomics
(core/parallel.h); there is no distributed path to port.  The TPU-native
scale-out axes:

- **sample parallel** (``render_sample_sharded``): every device renders the
  full film with its own spp shard, film reduces with one ``psum`` — MC
  estimates are embarrassingly parallel, so this is the preferred axis on ICI.
- **film-tile parallel** (``render_tile_sharded``): lanes (pixels) shard
  across devices; no collective needed, each device owns its tile.  Scene/BVH
  arrays are replicated (read-only after build).

Both run the identical wavefront program per shard under ``shard_map``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pine_tpu.integrators.path import path_trace_sample


def _to_varying(x, axis):
    """Mark a replicated value device-varying (pvary was deprecated for
    pcast in jax 0.9; support both so older jaxes keep working)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))


def make_device_mesh(n_devices=None, axis="d"):
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    return Mesh(np.asarray(devs), (axis,))


def render_sample_sharded(cscene, cam, W, H, sampler, spp, max_depth, mesh, axis="d"):
    """Each device renders spp/n_dev samples of the whole film; psum-mean.

    Scene/sampler device arrays enter as replicated shard_map inputs (never
    captured constants — see core/capture.py on dispatch poisoning)."""
    from pine_tpu.core.capture import bind, collect_device_arrays

    n_dev = mesh.shape[axis]
    assert spp % n_dev == 0, f"spp {spp} must divide over {n_dev} devices"
    local_spp = spp // n_dev
    n = W * H
    cam_params = cam.params()
    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))

    def shard_body(vals):
        with bind(setters, vals):
            dev = jax.lax.axis_index(axis)
            ys, xs = jnp.divmod(jnp.arange(n, dtype=jnp.int32), W)

            def body(i, acc):
                sample_index = dev * local_spp + i
                return acc + path_trace_sample(
                    cscene, cam_params, xs, ys, W, H, sampler, sample_index, max_depth
                )

            init = jnp.zeros((n, 3), jnp.float32)
            # the carry is device-varying (sample_index depends on axis_index)
            init = _to_varying(init, axis)
            total = jax.lax.fori_loop(0, local_spp, body, init)
            return jax.lax.psum(total, axis) / spp

    from jax import shard_map

    spec_rep = jax.tree.map(lambda _: P(), arrays)
    fn = shard_map(shard_body, mesh=mesh, in_specs=(spec_rep,), out_specs=P())
    return jax.jit(fn)(arrays).reshape(H, W, 3)


def render_tile_sharded(cscene, cam, W, H, sampler, spp, max_depth, mesh, axis="d"):
    """Film rows shard across devices; no collectives (each owns its tile)."""
    n_dev = mesh.shape[axis]
    assert H % n_dev == 0, f"film height {H} must divide over {n_dev} devices"
    from pine_tpu.core.capture import bind, collect_device_arrays

    n = W * H
    cam_params = cam.params()
    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))
    ys_all, xs_all = np.divmod(np.arange(n, dtype=np.int32), W)
    sharding = NamedSharding(mesh, P(axis))
    xs_d = jax.device_put(xs_all, sharding)
    ys_d = jax.device_put(ys_all, sharding)

    def shard_body(xs, ys, vals):
        with bind(setters, vals):
            def body(i, acc):
                return acc + path_trace_sample(
                    cscene, cam_params, xs, ys, W, H, sampler, i, max_depth
                )

            init = _to_varying(jnp.zeros((xs.shape[0], 3), jnp.float32), axis)
            total = jax.lax.fori_loop(0, spp, body, init)
            return total / spp

    from jax import shard_map

    spec_rep = jax.tree.map(lambda _: P(), arrays)
    fn = shard_map(
        shard_body, mesh=mesh, in_specs=(P(axis), P(axis), spec_rep), out_specs=P(axis)
    )
    return jax.jit(fn)(xs_d, ys_d, arrays).reshape(H, W, 3)

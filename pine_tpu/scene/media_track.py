"""Delta/ratio tracking for grid media as bounded wavefront loops
(parity: medium.cpp:204-290).

The reference's unbounded rejection loops become fixed-iteration
``fori_loop``s with per-lane done masks (SURVEY.md §7 hard part 5); lanes
whose tracking does not terminate within the step budget are treated as
pass-through (no scatter / full transmittance), a statistically controlled
bias that vanishes as the budget grows.

Randomness is counter-based: every step hashes (lane key, step, salt), so the
tracking is stateless like the samplers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pine_tpu.core import rng

TRACK_STEPS = 96


def ray_key(ro, rd):
    """Per-lane uint32 key from ray bits (fallback when no sampler key)."""
    rb = ro.view(jnp.int32).astype(jnp.uint32)
    db = rd.view(jnp.int32).astype(jnp.uint32)
    return rng.hash_combine(rb[:, 0], rb[:, 1], rb[:, 2], db[:, 0], db[:, 1], db[:, 2])


def _u(key, step, salt):
    return rng.uniform(key, jnp.uint32(step), jnp.uint32(salt))


def grid_transmittance(med, ro, rd, tmax, key):
    """Ratio tracking (medium.cpp:264-290) -> (N,3) transmittance."""
    n = ro.shape[0]
    t_in, t_out = med.bounds_interval(ro, rd)
    t_hi = jnp.minimum(t_out, tmax)
    relevant = t_hi > t_in
    sigma_maj = med.sigma_maj
    if sigma_maj <= 0.0:
        return jnp.ones((n, 3), jnp.float32)
    inv_maj = 1.0 / sigma_maj

    def body(i, carry):
        t, alive, u_chain = carry
        u_step = _u(key, i, 911)
        t2 = t - jnp.log(jnp.maximum(1.0 - u_step, 1e-7)) * inv_maj
        out = t2 >= t_hi
        p = ro + t2[:, None] * rd
        dd = 1.0 - med.sigma_z_bar * med.density_at(p) * inv_maj
        survive = u_chain < dd
        u_chain = jnp.where(survive, u_chain / jnp.maximum(dd, 1e-7), u_chain)
        alive2 = alive & ~out & survive
        killed = alive & ~out & ~survive
        return (
            jnp.where(alive & ~out, t2, t),
            alive2,
            u_chain,
        ), killed

    # manual unrolled-fori with kill accumulation
    t = t_in
    alive = relevant
    u_chain = _u(key, 0, 137)
    killed_any = jnp.zeros((n,), bool)

    def step(i, carry):
        t, alive, u_chain, killed_any = carry
        (t, alive, u_chain), killed = body(i, (t, alive, u_chain))
        return t, alive, u_chain, killed_any | killed

    t, alive, u_chain, killed_any = jax.lax.fori_loop(
        0, TRACK_STEPS, step, (t, alive, u_chain, killed_any)
    )
    tr = jnp.where(killed_any, 0.0, 1.0)
    return tr[:, None] * jnp.ones((1, 3), jnp.float32)


def grid_sample_scatter(med, ro, rd, t_limit, key):
    """Null-collision delta tracking (medium.cpp:204-251).

    -> (scattered, t_scatter, weight (N,3), absorbed).  Pass-through lanes
    already carry the stochastic transmittance (no extra Tr factor needed);
    the weight carries the chromatic sigma_s ratio (unit mean) so colored
    scattering albedo survives scalar tracking.  Absorption kills the lane
    (the reference comments its absorption branch out, medium.cpp:233-249,
    which subtly re-uses a stale u; real termination is strictly better)."""
    n = ro.shape[0]
    t_in, t_out = med.bounds_interval(ro, rd)
    t_hi = jnp.minimum(t_out, t_limit)
    relevant = t_hi > t_in
    sigma_maj = med.sigma_maj
    if sigma_maj <= 0.0:
        z = jnp.zeros((n,), bool)
        return z, jnp.zeros((n,), jnp.float32), jnp.ones((n, 3), jnp.float32), z
    inv_maj = 1.0 / sigma_maj

    def step(i, carry):
        t, walking, scattered, t_scat, absorbed, u_chain = carry
        u_step = _u(key, i, 523)
        t2 = t - jnp.log(jnp.maximum(1.0 - u_step, 1e-7)) * inv_maj
        out = t2 >= t_hi
        p = ro + t2[:, None] * rd
        D = med.density_at(p)
        sig_t = med.sigma_z_bar * D
        sig_s = med.sigma_s_bar * D
        prob_n = jnp.maximum(1.0 - sig_t * inv_maj, 0.0)
        prob_s = sig_s * inv_maj
        is_null = u_chain < prob_n
        is_scat = ~is_null & (u_chain < prob_n + prob_s)
        is_abs = ~is_null & ~is_scat
        u_chain = jnp.where(is_null, u_chain / jnp.maximum(prob_n, 1e-7), u_chain)
        act = walking & ~out
        scattered = scattered | (act & is_scat)
        absorbed = absorbed | (act & is_abs)
        t_scat = jnp.where(act & is_scat, t2, t_scat)
        walking = act & is_null
        return jnp.where(act, t2, t), walking, scattered, t_scat, absorbed, u_chain

    t = t_in
    walking = relevant
    scattered = jnp.zeros((n,), bool)
    absorbed = jnp.zeros((n,), bool)
    t_scat = jnp.zeros((n,), jnp.float32)
    u_chain = _u(key, 0, 881)
    t, walking, scattered, t_scat, absorbed, u_chain = jax.lax.fori_loop(
        0, TRACK_STEPS, step, (t, walking, scattered, t_scat, absorbed, u_chain)
    )
    w = jnp.asarray(med.sigma_s, jnp.float32) / max(med.sigma_s_bar, 1e-8)
    weight = jnp.broadcast_to(w[None, :], (n, 3))
    return scattered, t_scat, weight, absorbed

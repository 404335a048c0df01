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
    """Ratio tracking (medium.cpp:264-290) -> (N,3) transmittance.

    Continuous product form: Tr ~= prod_k (1 - sigma_t(x_k)/sigma_maj) over
    majorant-spaced collision points — the reference's estimator.  (An
    earlier Bernoulli-survival variant returned 0/1 per lane, which made
    in-cloud NEE shadow rays pure salt noise.)"""
    n = ro.shape[0]
    t_in, t_out = med.bounds_interval(ro, rd)
    t_hi = jnp.minimum(t_out, tmax)
    relevant = t_hi > t_in
    sigma_maj = med.sigma_maj
    if sigma_maj <= 0.0:
        return jnp.ones((n, 3), jnp.float32)
    inv_maj = 1.0 / sigma_maj

    def step(i, carry):
        t, alive, w = carry
        u_step = _u(key, i, 911)
        t2 = t - jnp.log(jnp.maximum(1.0 - u_step, 1e-7)) * inv_maj
        out = t2 >= t_hi
        p = ro + t2[:, None] * rd
        dd = jnp.maximum(1.0 - med.sigma_z_bar * med.density_at(p) * inv_maj, 0.0)
        act = alive & ~out
        w = jnp.where(act, w * dd, w)
        alive = act & (w > 1e-5)  # dead once opaque (early exit of the walk)
        return jnp.where(act, t2, t), alive, w

    t, alive, w = jax.lax.fori_loop(
        0, TRACK_STEPS, step,
        (t_in, relevant, jnp.ones((n,), jnp.float32)),
    )
    w = jnp.where(relevant, w, 1.0)
    return w[:, None] * jnp.ones((1, 3), jnp.float32)


def grid_sample_scatter(med, ro, rd, t_limit, key):
    """Null-collision delta tracking (medium.cpp:204-251).

    -> (scattered, t_scatter, weight (N,3), absorbed, le_emitted (N,3)).
    Pass-through lanes already carry the stochastic transmittance (no extra
    Tr factor needed); the weight carries the chromatic sigma_s ratio (unit
    mean) so colored scattering albedo survives scalar tracking.  Absorption
    kills the lane.  For emissive media (flames/temperature grids,
    medium.cpp:233-249 — commented out upstream, live here), ``le_emitted``
    accumulates blackbody radiance at every collision arrival weighted by the
    conditional absorption probability (Rao-Blackwellized form of the
    reference's emit-on-absorb branch: same mean, far lower variance than
    spiking full Le at rare absorption events)."""
    n = ro.shape[0]
    t_in, t_out = med.bounds_interval(ro, rd)
    t_hi = jnp.minimum(t_out, t_limit)
    relevant = t_hi > t_in
    sigma_maj = med.sigma_maj
    if sigma_maj <= 0.0:
        z = jnp.zeros((n,), bool)
        zf3 = jnp.zeros((n, 3), jnp.float32)
        return z, jnp.zeros((n,), jnp.float32), jnp.ones((n, 3), jnp.float32), z, zf3
    inv_maj = 1.0 / sigma_maj
    emissive = bool(getattr(med, "emissive", False))
    if emissive:
        ratio_a = jnp.asarray(med.sigma_a, jnp.float32) / max(med.sigma_a_bar, 1e-8)

    def step(i, carry):
        t, walking, scattered, t_scat, absorbed, le_acc, u_chain = carry
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
        if emissive:
            prob_a = jnp.maximum((sig_t - sig_s) * inv_maj, 0.0)
            le_acc = le_acc + jnp.where(
                act[:, None],
                (prob_a[:, None] * med.emission_at(p)) * ratio_a,
                0.0,
            )
        scattered = scattered | (act & is_scat)
        absorbed = absorbed | (act & is_abs)
        t_scat = jnp.where(act & is_scat, t2, t_scat)
        walking = act & is_null
        return (
            jnp.where(act, t2, t), walking, scattered, t_scat, absorbed, le_acc,
            u_chain,
        )

    t = t_in
    walking = relevant
    scattered = jnp.zeros((n,), bool)
    absorbed = jnp.zeros((n,), bool)
    t_scat = jnp.zeros((n,), jnp.float32)
    le_acc = jnp.zeros((n, 3), jnp.float32)
    u_chain = _u(key, 0, 881)
    t, walking, scattered, t_scat, absorbed, le_acc, u_chain = jax.lax.fori_loop(
        0, TRACK_STEPS, step,
        (t, walking, scattered, t_scat, absorbed, le_acc, u_chain),
    )
    w = jnp.asarray(med.sigma_s, jnp.float32) / max(med.sigma_s_bar, 1e-8)
    weight = jnp.broadcast_to(w[None, :], (n, 3))
    return scattered, t_scat, weight, absorbed, le_acc

"""Monte-Carlo sampling helpers, batched (parity: src/pine/core/sampling.h)."""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.vecmath import Pi


def sample_exp(u):
    return -jnp.log(1.0 - u)


def sample_disk_polar(u):
    r = jnp.sqrt(u[..., 0])
    theta = 2 * Pi * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def sample_disk_concentric(u):
    """Concentric disk mapping (sampling.h:21-35), branch-free."""
    ux = u[..., 0] * 2.0 - 1.0
    uy = u[..., 1] * 2.0 - 1.0
    use_x = jnp.abs(ux) > jnp.abs(uy)
    # Avoid 0/0 at the origin; result is scaled by r which is 0 there.
    safe = lambda a, b: a / jnp.where(b == 0.0, 1.0, b)
    r = jnp.where(use_x, ux, uy)
    theta = jnp.where(
        use_x, (Pi / 4.0) * safe(uy, ux), Pi / 2.0 - (Pi / 4.0) * safe(ux, uy)
    )
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def cosine_weighted_hemisphere(u):
    d = sample_disk_concentric(u)
    z = jnp.sqrt(jnp.maximum(1.0 - d[..., 0] ** 2 - d[..., 1] ** 2, 0.0))
    return jnp.concatenate([d, z[..., None]], axis=-1)


def uniform_sphere(u):
    phi = u[..., 0] * Pi * 2
    cos_theta = 1.0 - 2.0 * u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def uniform_hemisphere(u):
    phi = u[..., 0] * Pi * 2
    cos_theta = u[..., 1]
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def balance_heuristic(pf, pg):
    """One-sample MIS balance heuristic (sampling.h:72-75)."""
    return pf / jnp.maximum(pf + pg, 1e-20)


def power_heuristic(pf, pg):
    pf2, pg2 = pf * pf, pg * pg
    return pf2 / jnp.maximum(pf2 + pg2, 1e-20)


def with_prob(prob, u):
    """Stochastic branch + rescaled remainder (sampling.h:77-91).

    Returns (took_branch: bool array, u_rescaled).
    """
    take = u < prob
    u_new = jnp.where(
        take,
        u / jnp.maximum(prob, 1e-20),
        (u - prob) / jnp.maximum(1.0 - prob, 1e-20),
    )
    return take, jnp.clip(u_new, 0.0, 1.0 - 1e-7)

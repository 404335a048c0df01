"""Perlin-style gradient noise + fbm, vectorized (parity: core/noise.cpp).

The reference hashes lattice corners through its RNG to get gradient vectors;
we use the stateless PCG hash family from pine_tpu.core.rng — same structure,
different (but equally uniform) hash, so noise has the same statistics and
frequency content without bit-matching the reference's patterns.
"""
from __future__ import annotations

import jax.numpy as jnp

from pine_tpu.core.rng import hash_combine, u32_to_uniform
from pine_tpu.core.sampling import sample_disk_concentric
from pine_tpu.core.vecmath import Pi


def _corner_u2(ix, iy, iz, seed):
    h = hash_combine(ix.astype(jnp.int32), iy.astype(jnp.int32), iz.astype(jnp.int32), seed)
    import jax.numpy as _j

    from pine_tpu.core.rng import pcg_hash

    return jnp.stack([u32_to_uniform(h), u32_to_uniform(pcg_hash(h))], axis=-1)


def perlin_noise3(p, seed=0):
    """3-D gradient noise in [0,1] (noise.cpp:29-41), batched over (...,3)."""
    pf = jnp.floor(p)
    w = p - pf
    w = w * w * (3.0 - 2.0 * w)
    total = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                ix = pf[..., 0] + cx
                iy = pf[..., 1] + cy
                iz = pf[..., 2] + cz
                u2 = _corner_u2(ix, iy, iz, seed)
                phi = u2[..., 0] * 2 * Pi
                theta = u2[..., 1] * Pi
                g = jnp.stack(
                    [
                        jnp.sin(theta) * jnp.cos(phi),
                        jnp.sin(theta) * jnp.sin(phi),
                        jnp.cos(theta),
                    ],
                    axis=-1,
                )
                d = p - (pf + jnp.asarray([cx, cy, cz], p.dtype))
                wx = w[..., 0] if cx else 1.0 - w[..., 0]
                wy = w[..., 1] if cy else 1.0 - w[..., 1]
                wz = w[..., 2] if cz else 1.0 - w[..., 2]
                total = total + wx * wy * wz * jnp.sum(g * d, axis=-1)
    return 0.5 * (1.0 + total)


def perlin_noise2(p, seed=0):
    """2-D gradient noise in [0,1] (noise.cpp:17-28)."""
    pf = jnp.floor(p)
    w = p - pf
    w = w * w * (3.0 - 2.0 * w)
    total = 0.0
    zeros = jnp.zeros_like(pf[..., 0])
    for cx in (0, 1):
        for cy in (0, 1):
            u2 = _corner_u2(pf[..., 0] + cx, pf[..., 1] + cy, zeros, seed)
            g = sample_disk_concentric(u2)
            d = p - (pf + jnp.asarray([cx, cy], p.dtype))
            wx = w[..., 0] if cx else 1.0 - w[..., 0]
            wy = w[..., 1] if cy else 1.0 - w[..., 1]
            total = total + wx * wy * jnp.sum(g * d, axis=-1)
    return 0.5 * (1.0 + total)


def perlin_noise1(x, seed=0):
    xf = jnp.floor(x)
    w = x - xf
    w = w * w * (3.0 - 2.0 * w)
    zeros = jnp.zeros_like(xf)
    n0 = u32_to_uniform(hash_combine(xf.astype(jnp.int32), zeros.astype(jnp.int32), seed))
    n1 = u32_to_uniform(
        hash_combine((xf + 1).astype(jnp.int32), zeros.astype(jnp.int32), seed)
    )
    return 0.5 * (1.0 + (n0 + (n1 - n0) * w))


def _perlin_any(p, seed):
    p = jnp.asarray(p, jnp.float32)
    if p.ndim == 0 or p.shape[-1:] == ():
        return perlin_noise1(p, seed)
    if p.shape[-1] == 3:
        return perlin_noise3(p, seed)
    if p.shape[-1] == 2:
        return perlin_noise2(p, seed)
    return perlin_noise1(p, seed)


def fbm(p, octaves, max_octaves=8):
    """Octave sum -> squared normalized accumulation (noise.cpp:66-78).

    octaves may be traced; the loop runs to a static max and masks, matching
    TPU static-shape requirements.
    """
    octaves = jnp.asarray(octaves)
    accum = 0.0
    weight = 1.0
    p = jnp.asarray(p, jnp.float32)
    final_weight = jnp.float32(1.0)
    for i in range(max_octaves):
        active = i < octaves
        accum = accum + jnp.where(active, weight * _perlin_any(p, 0), 0.0)
        final_weight = jnp.where(active, weight * 0.5, final_weight)
        weight = weight * 0.5
        p = p * 2.0
    return jnp.square(accum / (2.0 - final_weight * 2.0))


def fbm2d(p, octaves, max_octaves=8):
    return jnp.stack([fbm(p, octaves, max_octaves), _fbm_seeded(p, octaves, 1, max_octaves)], -1)


def _fbm_seeded(p, octaves, seed, max_octaves=8):
    octaves = jnp.asarray(octaves)
    accum = 0.0
    weight = 1.0
    p = jnp.asarray(p, jnp.float32)
    final_weight = jnp.float32(1.0)
    for i in range(max_octaves):
        active = i < octaves
        accum = accum + jnp.where(active, weight * _perlin_any(p, seed), 0.0)
        final_weight = jnp.where(active, weight * 0.5, final_weight)
        weight = weight * 0.5
        p = p * 2.0
    return jnp.square(accum / (2.0 - final_weight * 2.0))


def fbm3d(p, octaves, max_octaves=8):
    return jnp.stack(
        [
            fbm(p, octaves, max_octaves),
            _fbm_seeded(p, octaves, 1, max_octaves),
            _fbm_seeded(p, octaves, 2, max_octaves),
        ],
        -1,
    )

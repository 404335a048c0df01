"""Counter-based (stateless) random hashing for wavefront rendering.

The reference keeps per-thread mutable RNG/sampler state
(src/pine/core/rng.h xoroshiro128+, parallel.h threadIdx).  On TPU every lane
derives its randomness purely from ``hash(pixel, sample_index, dimension)`` so
the whole wavefront is deterministic, order-independent, and replayable — the
TPU-native equivalent of per-thread sampler clones.

Hash family: PCG-style integer mixing (same spirit as rng.h mix_bits /
MurmurHash64A but chosen for vectorized 32-bit math on the VPU).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _as_u32(x):
    return jnp.asarray(x).astype(_U32)


def pcg_hash(x):
    """PCG output function on uint32 (public-domain PCG family)."""
    x = _as_u32(x)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> (state >> _U32(28)) + _U32(4)) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def hash_combine(*xs):
    """Mix any number of uint32 streams into one."""
    h = _as_u32(xs[0])
    for x in xs[1:]:
        h = pcg_hash(h ^ (_as_u32(x) + _U32(0x9E3779B9) + (h << _U32(6)) + (h >> _U32(2))))
    return pcg_hash(h)


def u32_to_uniform(bits):
    """uint32 -> float32 in [0,1) with 24-bit mantissa precision."""
    return (bits >> _U32(8)).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def uniform(*keys):
    """Stateless uniform float in [0,1) from integer keys."""
    return u32_to_uniform(hash_combine(*keys))


def uniform2(*keys):
    h = hash_combine(*keys)
    return jnp.stack([u32_to_uniform(h), u32_to_uniform(pcg_hash(h))], axis=-1)


def uniform3(*keys):
    h = hash_combine(*keys)
    h2 = pcg_hash(h)
    h3 = pcg_hash(h2)
    return jnp.stack(
        [u32_to_uniform(h), u32_to_uniform(h2), u32_to_uniform(h3)], axis=-1
    )


class RNG:
    """Sequential RNG for host-side PRL scripts (parity with PRL `RNG`).

    PRL scripts call srand/randf/rand2f/rand3f eagerly while building scenes;
    this wraps numpy's PCG64 — not used on the device path.
    """

    def __init__(self, seed: int = 0):
        self._g = np.random.Generator(np.random.PCG64(seed))

    def seed(self, s: int):
        self._g = np.random.Generator(np.random.PCG64(s))

    def uniformf(self):
        return np.float32(self._g.random())

    def uniform2f(self):
        return self._g.random(2).astype(np.float32)

    def uniform3f(self):
        return self._g.random(3).astype(np.float32)

    def uniformi(self, lo=0, hi=2**31 - 1):
        return int(self._g.integers(lo, hi))

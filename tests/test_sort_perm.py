"""Wavefront coherence-sort keys (scene._ray_sort_perm).

The sort is a pure permutation — render parity is covered by the
integrator's shared apply path (octant mode A/B'd bitwise identical,
STATUS r4); these tests pin the KEY semantics each mode promises:

- both modes return a valid permutation with dead lanes packed last;
- octant mode (mesh scenes) groups by direction octant above origin;
- origin mode (instanced scenes) keeps rays from one origin cell —
  one instance — adjacent across direction octants, the property the
  two-level kernel's per-block instance-entry union depends on.
"""
import numpy as np
import jax.numpy as jnp

from pine_tpu.scene.scene import _ray_sort_perm


def _mk(n, seed=0):
    r = np.random.RandomState(seed)
    ro = r.uniform(0, 1, (n, 3)).astype(np.float32)
    rd = r.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _perm_ok(perm, inv, n):
    p = np.asarray(perm)
    assert sorted(p.tolist()) == list(range(n))
    assert np.array_equal(np.asarray(inv)[p], np.arange(n))


def test_both_modes_valid_permutation_dead_last():
    n = 512
    ro, rd = _mk(n)
    tmin = jnp.zeros((n,), jnp.float32)
    # mark a scattered third of lanes dead (tmax <= tmin)
    tmax = jnp.where(jnp.arange(n) % 3 == 0, -1.0, 1.0).astype(jnp.float32)
    lo = np.zeros(3, np.float32)
    for mode in ("octant", "origin"):
        perm, inv = _ray_sort_perm(ro, rd, tmin, tmax, lo, 1.0, mode=mode)
        _perm_ok(perm, inv, n)
        dead = np.asarray(tmax <= tmin)[np.asarray(perm)]
        first_dead = int(np.argmax(dead)) if dead.any() else n
        assert not dead[:first_dead].any() and dead[first_dead:].all(), mode


def test_origin_mode_keeps_instance_cells_together():
    # two tight origin clusters ("instances") far apart, random directions:
    # origin mode must keep each cluster contiguous; octant mode must not
    # (it splits clusters across direction octants — the measured failure
    # on the 1024-rock field).
    n = 256
    r = np.random.RandomState(1)
    centers = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32)
    which = r.randint(0, 2, n)
    ro = centers[which] + r.uniform(-1e-3, 1e-3, (n, 3)).astype(np.float32)
    rd = r.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.ones((n,), jnp.float32)
    lo = np.zeros(3, np.float32)

    def runs(mode):
        perm, _ = _ray_sort_perm(
            jnp.asarray(ro), jnp.asarray(rd), tmin, tmax, lo, 1.0, mode=mode
        )
        w = which[np.asarray(perm)]
        return int((w[1:] != w[:-1]).sum()) + 1

    assert runs("origin") == 2
    assert runs("octant") > 2

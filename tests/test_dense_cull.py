"""Dense-kernel group-AABB block cull (accel/pallas_traverse._make_dense_kernel):
an (8,128) ray block none of whose lanes can reach the group's bounds skips
the whole unrolled prim sweep via pl.when — verify the skipped path passes
best_t/best_e (and the any-hit flag) through bitwise, and that mixed ray sets
still match the XLA packet walk lane-for-lane (interpret mode on CPU)."""
from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture()
def sphere_accel():
    from pine_tpu.accel import packet as PK
    from pine_tpu.scene import shapes as S

    rng = np.random.default_rng(7)
    prims = []
    for i in range(12):  # dense group (<= DENSE_MAX=16), clustered near origin
        c = rng.uniform(-1, 1, 3).astype(np.float32)
        r = 0.2
        prims.append(
            (S.SPHERE, np.concatenate([c, [r]]).astype(np.float32), 0,
             (c - r, c + r))
        )
    accel = PK.build_packet_accel(prims, [])
    (g,) = accel["groups"]
    assert g["kind"] == "dense"
    return accel


def _mixed_rays():
    """First 1024 lanes (one whole block): origins far +x pointing away from
    the group — the block-cull slab must fail for every lane.  Second block:
    rays through the cluster."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 2048
    ro = np.zeros((n, 3), np.float32)
    rd = np.zeros((n, 3), np.float32)
    ro[:1024] = [50.0, 0.0, 0.0]
    rd[:1024] = [1.0, 0.0, 0.0]  # away from the cluster at the origin
    ro[1024:] = rng.uniform(-3, 3, (1024, 3)).astype(np.float32)
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    rd[1024:] = d / np.linalg.norm(d, axis=1, keepdims=True)
    return (
        jnp.asarray(ro), jnp.asarray(rd),
        jnp.zeros(n, jnp.float32), jnp.full(n, 1e30, jnp.float32),
    )


def test_dense_cull_closest_matches_xla(sphere_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _mixed_rays()
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    t_ref, e_ref = PK.packet_intersect(sphere_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    monkeypatch.setenv("PINE_SMALL_KERNEL", "dense")
    t_new, e_new = PK.packet_intersect(sphere_accel, ro, rd, tmin, tmax)

    t_ref, t_new = np.asarray(t_ref), np.asarray(t_new)
    e_ref, e_new = np.asarray(e_ref), np.asarray(e_new)
    # the culled block must report clean misses
    assert (t_new[:1024] >= 1e30).all()
    np.testing.assert_allclose(t_new, t_ref, rtol=1e-5, atol=1e-6)
    hit = t_ref < 1e30
    assert (e_new[hit] == e_ref[hit]).all()


def test_dense_cull_any_hit_matches_xla(sphere_accel, monkeypatch):
    from pine_tpu.accel import packet as PK

    ro, rd, tmin, tmax = _mixed_rays()
    monkeypatch.setenv("PINE_TPU_PALLAS", "0")
    occ_ref = PK.packet_any_hit(sphere_accel, ro, rd, tmin, tmax)
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    monkeypatch.setenv("PINE_SMALL_KERNEL", "dense")
    occ_new = PK.packet_any_hit(sphere_accel, ro, rd, tmin, tmax)

    occ_ref, occ_new = np.asarray(occ_ref), np.asarray(occ_new)
    assert not occ_new[:1024].any()
    assert (occ_new == occ_ref).all()

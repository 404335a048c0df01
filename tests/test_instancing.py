"""Lazy two-level instancing (geometry.h:371-390, Embree RTC instancing):
O(mesh) memory, hit parity with the flattened path."""
import numpy as np
import pytest

import pine_tpu.scene.scene as scene_mod
from pine_tpu.scene import materials as M, shapes as S
from pine_tpu.scene.scene import Scene


def _ball_mesh(n_theta=12, n_phi=12, r=0.4):
    """Small UV sphere mesh."""
    th = np.linspace(0, np.pi, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    V = np.stack(
        [r * np.sin(T) * np.cos(P), r * np.cos(T), r * np.sin(T) * np.sin(P)],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_theta * n_phi).reshape(n_theta, n_phi)
    a = idx[:-1, :]
    b = idx[1:, :]
    c = np.roll(idx[:-1, :], -1, axis=1)
    d = np.roll(idx[1:, :], -1, axis=1)
    F = np.concatenate(
        [np.stack([a.ravel(), b.ravel(), c.ravel()], -1),
         np.stack([c.ravel(), b.ravel(), d.ravel()], -1)]
    ).astype(np.uint32)
    return V, F


def _grid_transforms(nx, nz, spacing=1.2, scale=1.0):
    ms = []
    for i in range(nx):
        for j in range(nz):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] *= scale
            m[0, 3] = (i - nx / 2) * spacing
            m[1, 3] = 0.15 * ((i * 7 + j * 3) % 5)
            m[2, 3] = j * spacing + 1.0
            ms.append(m)
    return ms


def _build(lazy, nx=4, nz=4):
    """Same scene through both paths, toggled via FLATTEN_LIMIT."""
    V, F = _ball_mesh()
    old = scene_mod.FLATTEN_LIMIT
    scene_mod.FLATTEN_LIMIT = 0 if lazy else 10**9
    try:
        sc = Scene()
        sc.add("white", M.Diffuse([0.8, 0.8, 0.8]))
        inst = S.InstancedShape(S.Mesh(V, F))
        for m in _grid_transforms(nx, nz):
            inst.add(m, sc.materials["white"])
        sc.add(inst)
        sc.add(S.Rect([0, -0.5, 3], [10, 0, 0], [0, 0, 10]), M.Diffuse([0.6, 0.6, 0.6]))
        cs = sc.compile()
    finally:
        scene_mod.FLATTEN_LIMIT = old
    return cs


def _camera_rays(n=64):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    # rays from above-front toward the instance grid
    ro = np.tile([[0.0, 3.0, -4.0]], (n, 1)).astype(np.float32)
    target = np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-0.5, 1.0, n), rng.uniform(0.5, 6, n)],
        axis=-1,
    ).astype(np.float32)
    rd = target - ro
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_instanced_matches_flattened():
    import jax.numpy as jnp

    cs_flat = _build(lazy=False)
    cs_inst = _build(lazy=True)
    assert cs_inst.unified.get("inst_groups"), "lazy path not taken"
    assert not cs_flat.unified.get("inst_groups"), "flatten path not taken"

    ro, rd = _camera_rays(256)
    n = ro.shape[0]
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t_f, g_f, hit_f, mt_f = cs_flat.intersect(ro, rd, tmin, tmax)
    t_i, g_i, hit_i, mt_i = cs_inst.intersect(ro, rd, tmin, tmax)
    assert np.array_equal(np.asarray(hit_f), np.asarray(hit_i))
    np.testing.assert_allclose(
        np.asarray(t_f)[np.asarray(hit_f)], np.asarray(t_i)[np.asarray(hit_i)],
        rtol=2e-4, atol=2e-4,
    )
    # same surface normals at the hits (mesh geometry identical)
    hp_f = np.asarray(ro + t_f[:, None] * rd)
    _, n_f, _ = cs_flat.surface_info(g_f, jnp.asarray(hp_f), mt_f)
    _, n_i, _ = cs_inst.surface_info(g_i, jnp.asarray(hp_f), mt_i)
    m = np.asarray(hit_f)
    dots = np.sum(np.asarray(n_f)[m] * np.asarray(n_i)[m], axis=-1)
    assert (dots > 0.999).all(), dots.min()
    # occlusion parity
    o_f = np.asarray(cs_flat.any_hit(ro, rd, tmin, jnp.minimum(t_f + 1.0, 1e30)))
    o_i = np.asarray(cs_inst.any_hit(ro, rd, tmin, jnp.minimum(t_i + 1.0, 1e30)))
    assert np.array_equal(o_f, o_i)


def test_instanced_memory_is_o_mesh():
    """1000 instances of a mesh: accel triangle storage stays O(mesh)."""
    V, F = _ball_mesh(16, 16)  # 480 tris
    old = scene_mod.FLATTEN_LIMIT
    scene_mod.FLATTEN_LIMIT = 0
    try:
        sc = Scene()
        inst = S.InstancedShape(S.Mesh(V, F))
        mat = M.Diffuse([0.7, 0.7, 0.7])
        for m in _grid_transforms(40, 25, spacing=1.0):
            inst.add(m, mat)
        sc.add(inst)
        cs = sc.compile()
    finally:
        scene_mod.FLATTEN_LIMIT = old
    igs = cs.unified["inst_groups"]
    assert len(igs) == 1 and igs[0]["n_inst"] == 1000
    n_tris = len(F)
    # the shared mesh table holds exactly the unique mesh's triangles (+pad)
    assert igs[0]["mesh"]["rows"].shape[0] == n_tris + 4
    # no realized per-instance triangles anywhere in the entity table
    assert cs.unified["n_entities"] == 0
    # per-instance global entries exist (materials), but they're O(instances)
    assert cs.n_global == 1000

    # a center ray hits some instance
    import jax.numpy as jnp

    ro = jnp.asarray(np.tile([[0.0, 0.3, -3.0]], (8, 1)).astype(np.float32))
    rd = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (8, 1)).astype(np.float32))
    t, g, hit, mt = cs.intersect(ro, rd, jnp.zeros((8,)), jnp.full((8,), 1e30))
    assert bool(np.asarray(hit).all())


def test_instanced_render_smoke():
    """End-to-end: a small instanced field renders finite, lit pixels."""
    import jax.numpy as jnp

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import UniformSampler
    from pine_tpu.integrators.path import render_wavefront

    V, F = _ball_mesh()
    old = scene_mod.FLATTEN_LIMIT
    scene_mod.FLATTEN_LIMIT = 0
    try:
        sc = Scene()
        inst = S.InstancedShape(S.Mesh(V, F))
        mat = M.Diffuse([0.8, 0.5, 0.3])
        for m in _grid_transforms(3, 3):
            inst.add(m, mat)
        sc.add(inst)
        sc.add(S.Rect([0, -0.5, 3], [10, 0, 0], [0, 0, 10]), M.Diffuse([0.6, 0.6, 0.6]))
        sc.add(S.Rect([0, 6, 2], [2, 0, 0], [0, 0, 2]), M.Emissive([12, 12, 12]))
        sc.set(ThinLenCamera(Film([16, 16]), [0, 2.5, -4], [0, 0, 2], 0.5))
        cs = sc.compile()
        img = np.asarray(
            render_wavefront(cs, sc.camera, 16, 16, UniformSampler(8), 8, 3)
        )
    finally:
        scene_mod.FLATTEN_LIMIT = old
    assert np.isfinite(img).all()
    assert img.max() > 0.05


def test_instanced_fast_path_interpret_parity(monkeypatch):
    """The TPU dense-enumeration + Pallas-sweep path (accel/instanced_pallas)
    must agree with the XLA packet walk — exercised via Pallas interpret mode
    on a small scene (the big-scene parity ran manually; this pins it)."""
    import jax.numpy as jnp

    cs = _build(lazy=True, nx=2, nz=2)
    ro, rd = _camera_rays(64)
    tmin = jnp.zeros((64,))
    tmax = jnp.full((64,), 1e30)
    t_ref, g_ref, hit_ref, _ = cs.intersect(ro, rd, tmin, tmax)
    occ_ref = cs.any_hit(ro, rd, tmin, jnp.full((64,), 8.0))
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    t_f, g_f, hit_f, _ = cs.intersect(ro, rd, tmin, tmax)
    occ_f = cs.any_hit(ro, rd, tmin, jnp.full((64,), 8.0))
    assert np.array_equal(np.asarray(hit_ref), np.asarray(hit_f))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_f)[m], rtol=2e-4, atol=2e-4
    )
    assert np.array_equal(np.asarray(g_ref), np.asarray(g_f))
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ_f))


def test_instanced_mxu_kernel_parity(monkeypatch):
    """PINE_INST_KERNEL=mxu (matmul leaf tests over local rays) must agree
    with the XLA packet walk like the VPU kernel does."""
    import jax.numpy as jnp

    cs = _build(lazy=True, nx=2, nz=2)
    ro, rd = _camera_rays(64)
    tmin = jnp.zeros((64,))
    tmax = jnp.full((64,), 1e30)
    t_ref, g_ref, hit_ref, _ = cs.intersect(ro, rd, tmin, tmax)
    occ_ref = cs.any_hit(ro, rd, tmin, jnp.full((64,), 8.0))
    monkeypatch.setenv("PINE_TPU_PALLAS", "1")
    monkeypatch.setenv("PINE_INST_KERNEL", "mxu")
    t_f, g_f, hit_f, _ = cs.intersect(ro, rd, tmin, tmax)
    occ_f = cs.any_hit(ro, rd, tmin, jnp.full((64,), 8.0))
    assert np.array_equal(np.asarray(hit_ref), np.asarray(hit_f))
    m = np.asarray(hit_ref)
    np.testing.assert_allclose(
        np.asarray(t_ref)[m], np.asarray(t_f)[m], rtol=3e-4, atol=3e-4
    )
    assert np.array_equal(np.asarray(g_ref), np.asarray(g_f))
    assert np.array_equal(np.asarray(occ_ref), np.asarray(occ_f))


def test_stack_need_gates_kernel(monkeypatch):
    """kernel_supports must refuse scenes whose worst-case traversal stack
    exceeds STACK_DEPTH (the kernel's bounded push would otherwise silently
    drop subtrees on overflow)."""
    from pine_tpu.accel import instanced_kernel as IK

    cs = _build(lazy=True, nx=6, nz=6)
    g = next(
        g for g in cs.unified["inst_groups"] if g.get("kind") == "instanced"
    )
    need = IK._stack_need(g)
    # exact bound: top depth * (1 deferred sibling + 2*TREE_LEAF instance
    # entries) + mesh depth + margin; must fit with lots of headroom here
    assert 0 < need <= IK.STACK_DEPTH, need
    assert IK.kernel_supports(g)
    monkeypatch.setattr(IK, "STACK_DEPTH", need - 1)
    assert not IK.kernel_supports(g)

"""Tests for the non-facade integrators (VERDICT r1 items 4-6): each one must
run its REAL algorithm and agree with plain path tracing in expectation."""
from __future__ import annotations

import numpy as np
import pytest

from pine_tpu.core.camera import ThinLenCamera
from pine_tpu.core.film import Film
from pine_tpu.core.samplers import BlueSampler, UniformSampler
from pine_tpu.integrators.path import render_wavefront
from pine_tpu.scene import materials as M
from pine_tpu.scene import shapes as S
from pine_tpu.scene.scene import Scene


def tame_cbox(res=32):
    """Cbox with a large dim light: the path-level firefly clamp never binds,
    so unclamped estimators (guided/MLT) agree with plain path."""
    sc = Scene()
    sc.add("w", M.Diffuse([0.8, 0.8, 0.8]))
    sc.add(S.Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "w")
    sc.add(S.Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), "w")
    sc.add(S.Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), M.Diffuse([0.8, 0.2, 0.2]))
    sc.add(S.Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), M.Diffuse([0.2, 0.8, 0.2]))
    sc.add(S.Rect([0, 1, 2], [2, 0, 0], [0, 2, 0]), "w")
    sc.add(S.Sphere([0.3, 0.5, 1.0], 0.5), "w")
    sc.add(S.Rect([0, 1.99, 1], [1.2, 0, 0], [0, 0, 1.2]), M.Emissive([4.0, 4.0, 4.0]))
    sc.set(ThinLenCamera(Film([res, res], "uncharted2"), [0, 1, -3.5], [0, 1, 0], 0.3))
    return sc


@pytest.fixture(scope="module")
def tame():
    scene = tame_cbox(32)
    cscene = scene.compile()
    ref = np.asarray(
        render_wavefront(cscene, scene.camera, 32, 32, UniformSampler(192), 192, 4)
    )
    return scene, cscene, ref


def test_cachedpath_real(tame):
    from pine_tpu.integrators.cachedpath import render_cached

    scene, cscene, ref = tame
    img = np.asarray(
        render_cached(cscene, scene.camera, 32, 32, UniformSampler(32), 32, 4, 32, 1)
    )
    assert np.isfinite(img).all()
    # biased (empty cells -> 0) but must be close; a facade falling back to
    # plain PT would match exactly, so also check the cache actually engaged
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.25, rel


def test_cachedpath_learns_flux(tame):
    """The spatial grid must receive flux during learning."""
    import jax.numpy as jnp

    from pine_tpu.core.capture import bind, collect_device_arrays
    from pine_tpu.integrators.cachedpath import SpatialGrid, _trace_recorded

    scene, cscene, ref = tame
    lo, hi = cscene.scene.get_aabb()
    grid = SpatialGrid(lo, hi, 16)
    sampler = UniformSampler(4)
    cam_params = scene.camera.params()
    n = 32 * 32
    ys, xs = np.divmod(np.arange(n, dtype=np.int64), 32)
    recs = _trace_recorded(
        cscene, cam_params, jnp.asarray(xs, jnp.int32), jnp.asarray(ys, jnp.int32),
        32, 32, sampler, 0, 4, grid,
    )
    assert bool(np.asarray(recs["valid"][0]).any())
    assert float(np.asarray(recs["nee"][0]).sum()) > 0.0


def test_guidedpath_unbiased_tame(tame):
    from pine_tpu.integrators.guidedpath import render_guided

    scene, cscene, ref = tame
    img = np.asarray(
        render_guided(cscene, scene.camera, 32, 32, UniformSampler(24), 24, 4, 16)
    )
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.12, rel


def test_guided_histogram_sampling_consistent():
    """guide.sample's pdf must match guide.pdf at the sampled direction."""
    import jax.numpy as jnp

    from pine_tpu.integrators.cachedpath import SpatialGrid
    from pine_tpu.integrators.guidedpath import DIR_RES, DirectionalGuide

    rng = np.random.default_rng(3)
    guide = DirectionalGuide(SpatialGrid([0, 0, 0], [1, 1, 1], 2))
    n = 512
    hist = jnp.asarray(rng.random((n, DIR_RES * DIR_RES)).astype(np.float32) ** 8)
    u2 = jnp.asarray(rng.random((n, 2)).astype(np.float32))
    ud = jnp.asarray(rng.random(n).astype(np.float32))
    wo, pdf, valid = guide.sample(hist, u2, ud)
    pdf2 = guide.pdf(hist, wo)
    assert np.allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)
    assert bool(np.asarray(valid).all())
    # unit directions
    assert np.allclose(np.linalg.norm(np.asarray(wo), axis=1), 1.0, atol=1e-4)


def test_guidedpath_variance_parity(tame):
    """Guided one-sample MIS must not blow up variance vs plain path (the
    round-2 build found 7x and 1500x regressions from blending weights and an
    epsilon mismatch in rough-transmission f/pdf; this pins the fix)."""
    from pine_tpu.integrators.guidedpath import render_guided

    scene, cscene, ref = tame
    g = np.asarray(
        render_guided(cscene, scene.camera, 32, 32, UniformSampler(16, seed=5), 16, 4, 16)
    )
    p = np.asarray(
        render_wavefront(cscene, scene.camera, 32, 32, UniformSampler(16, seed=5), 16, 4)
    )
    g_mse = float(np.mean((g - ref) ** 2))
    p_mse = float(np.mean((p - ref) ** 2))
    assert g_mse < 3.0 * p_mse + 1e-6, (g_mse, p_mse)


def test_mlt_matches_path_tame(tame):
    from pine_tpu.integrators.mlt import render_mlt

    scene, cscene, ref = tame
    img = np.asarray(
        render_mlt(cscene, scene.camera, 32, 32, 12, 4, n_chains=1024)
    )
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.15, rel


def test_mlt_acceptance_math():
    import jax.numpy as jnp

    from pine_tpu.integrators.mlt import accept_prob

    a = accept_prob(jnp.asarray([2.0, 0.5, 0.0, 1.0]), jnp.asarray([1.0, 1.0, 1.0, 0.0]))
    assert np.allclose(np.asarray(a), [1.0, 0.5, 0.0, 1.0])


def test_mlt_mutation_stays_in_unit_cube():
    import jax.numpy as jnp

    from pine_tpu.integrators.mlt import mutate

    X = jnp.asarray(np.random.default_rng(0).random((64, 20)).astype(np.float32))
    ids = jnp.arange(64, dtype=jnp.uint32)
    Xn, large = mutate(X, ids, 3)
    Xn = np.asarray(Xn)
    assert ((Xn >= 0.0) & (Xn < 1.0)).all()
    # small steps stay near the original
    small = ~np.asarray(large)
    d = np.abs(Xn[small] - np.asarray(X)[small])
    d = np.minimum(d, 1.0 - d)  # torus distance
    assert d.mean() < 0.05


def test_vol_integrator_closed_form():
    from pine_tpu.integrators.vol import VolIntegrator

    sc = Scene()
    sc.add(S.Sphere([0, 0, 100], 0.01), M.Diffuse([1, 1, 1]))  # placate compile
    sc.set(ThinLenCamera(Film([16, 16], "uncharted2"), [0, 1, -4], [0, 1, 4], 0.5))
    film = VolIntegrator(UniformSampler(1)).render(sc)
    img = film.pixels[..., :3]
    assert np.isfinite(img).all()
    assert img.max() > img.min() >= 0.0


def test_bssrdf_random_walk_translucency():
    """BSSRDF random walk (bxdf.cpp:329-352): a back-lit sphere transmits
    more light when the scattering coefficient is lower; a dense medium is
    opaque from the front.  Round 1's cosine-lobe facade ignored sigma_s
    entirely and would show NO dependence."""
    from pine_tpu.scene import lights as L

    def build(sigma):
        sc = Scene()
        sc.add(S.Plane([0, -1, 0], [0, 1, 0]), M.Diffuse([0.8, 0.8, 0.8]))
        sc.add(S.Sphere([0, 0, 0], 1.0), M.Subsurface([0.9, 0.6, 0.5], 0.0, sigma))
        sc.add(L.PointLight(np.asarray([0, 0.0, 2.5]), np.asarray([60.0, 60.0, 60.0])))
        sc.set(ThinLenCamera(Film([32, 32], "uncharted2"), [0, 0, -4], [0, 0, 0], 0.4))
        return sc

    centers = {}
    for sigma in (40.0, 3.0):
        sc = build(sigma)
        cs = sc.compile()
        assert cs.has_subsurface
        img = np.asarray(
            render_wavefront(cs, sc.camera, 32, 32, UniformSampler(16), 16, 4)
        )
        assert np.isfinite(img).all()
        centers[sigma] = float(img[12:20, 12:20].mean())
    assert centers[3.0] > 5 * centers[40.0], centers


def test_restir_matches_direct(tame):
    """ReSTIR DI (restir.cpp:36-127, with the reference's commented final
    gather actually implemented) must agree with depth-2 path tracing."""
    from pine_tpu.integrators.restir import render_restir

    scene, cscene, ref4 = tame
    ref = np.asarray(
        render_wavefront(cscene, scene.camera, 32, 32, UniformSampler(128), 128, 2)
    )
    img = np.asarray(render_restir(cscene, scene.camera, 32, 32, UniformSampler(16), 16))
    assert np.isfinite(img).all()
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.1, rel


def test_micro_render_gi(tame):
    """MicroRenderGI: surfel gather produces finite, lit output with indirect
    color bleeding (a facade returning path tracing would differ in noise
    structure; here we check the surfel pipeline runs and bounces light)."""
    from pine_tpu.integrators.micro_render import render_micro

    scene, cscene, ref = tame
    img = np.asarray(render_micro(cscene, scene.camera, 32, 32, 512, chunk=1024))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05
    # surfel GI adds energy over pure direct lighting somewhere
    assert img.max() > 0.2


def test_denoiser_reduces_noise(tame):
    """denoise(scene): edge-aware a-trous filter must reduce total variation
    while preserving mean (the reference's OIDN body is commented out;
    denoise there is a no-op)."""
    from pine_tpu.integrators.denoiser import denoise_scene
    from pine_tpu.integrators.path import PathIntegrator

    scene, cscene, ref = tame
    PathIntegrator(UniformSampler(4), 4).render(scene)
    noisy = scene.camera.film.pixels[..., :3].copy()
    denoise_scene(scene)
    den = scene.camera.film.pixels[..., :3]

    def tv(a):
        return np.abs(np.diff(a, axis=0)).mean() + np.abs(np.diff(a, axis=1)).mean()

    assert np.isfinite(den).all()
    assert tv(den) < 0.8 * tv(noisy)
    assert abs(den.mean() - noisy.mean()) / noisy.mean() < 0.05


def test_micro_render_structural_quality():
    """VERDICT r2 weak 3: the point-based GI view must not look like a debug
    buffer — the subsurface sphere renders non-black (sigma_s apparent color)
    and occlusion comes from the microbuffer z-test, not hard blobs."""
    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.integrators.micro_render import render_micro
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.scene import Scene

    sc = Scene()
    sc.add(S.Disk([0, 0, 0], [0, 1, 0], 50), M.Diffuse([0.8, 0.8, 0.8]))
    sc.add(S.Sphere([-2.2, 1, 0], 1), M.Uber([1.0, 1.0, 1.0], 0.0, 1.0))
    sc.add(S.Sphere([0, 1, 0], 1), M.Subsurface([0, 0, 0], 0, [1, 0.8, 0.6]))
    sc.add(S.Sphere([2.2, 1, 0], 1), M.Uber([0.98, 0.55, 0.02], 0.0, 0.0))
    sc.add(S.Rect([-1, 3, -1], [1, 0, 0], [0, 0, 1]), M.Emissive([160, 160, 160]))
    sc.set(ThinLenCamera(Film([64, 32]), [0, 4, -8], [0, 1, 0], 0.3))
    W, H = 64, 32
    img = np.asarray(render_micro(sc.compile(), sc.camera, W, H, 1024, chunk=2048))
    assert np.isfinite(img).all()
    # the subsurface (middle) sphere region is NOT black: its apparent color
    # comes from sigma_s=[1,0.8,0.6] (warm) — mean above a visibility floor
    mid = img[14:20, 28:36]  # row 0 = image bottom (film y-up)
    assert mid.mean() > 0.05, mid.mean()
    # warm tint: red channel dominates blue on the SSS sphere
    assert mid[..., 0].mean() > mid[..., 2].mean()
    # the contact region below a sphere is darker than open floor (occlusion
    # works) but not hard-black (push-pull filled microbuffer)
    open_floor = img[0:4, 2:10].mean()
    contact = img[8:12, 28:36].mean()
    assert contact < 0.5 * open_floor
    assert contact > 0.0


def test_micro_render_microbuffer_resolution(tame):
    """Reference parity: 32x32 microbuffers (micro_render.cpp:108-110) are the
    default; the legacy 16x16 buffer remains reachable and measurably coarser
    (different gather: quality is quadratic in the buffer edge)."""
    from pine_tpu.integrators.micro_render import HB, render_micro

    assert HB == 32
    scene, cscene, ref = tame
    hi = np.asarray(render_micro(cscene, scene.camera, 32, 32, 512, chunk=1024, hb=32))
    lo = np.asarray(render_micro(cscene, scene.camera, 32, 32, 512, chunk=1024, hb=16))
    assert np.isfinite(hi).all() and np.isfinite(lo).all()
    rmse = float(np.sqrt(np.mean((hi - lo) ** 2)))
    # same scene, same surfels: images agree in the large but the coarser
    # buffer quantizes visibility differently -> a real, nonzero delta
    assert 0.0 < rmse < 0.25, rmse
    assert abs(hi.mean() - lo.mean()) / max(hi.mean(), 1e-6) < 0.25


def alcove_scene(res=24):
    """Indirect-dominant room: the only light sits in an alcove behind a
    holed wall, so NEE from most of the room is occluded and continuation
    rays must aim at the opening — the transport Practical Path Guiding
    exists for (spatial_tree.h:30-355)."""
    sc = Scene()
    sc.add("w", M.Diffuse([0.75, 0.75, 0.75]))
    sc.add(S.Rect([0, 0, 1], [2, 0, 0], [0, 0, 2]), "w")            # floor
    sc.add(S.Rect([0, 2, 1], [2, 0, 0], [0, 0, 2]), "w")            # ceiling
    sc.add(S.Rect([-1, 1, 1], [0, 0, 2], [0, 2, 0]), M.Diffuse([0.8, 0.2, 0.2]))
    sc.add(S.Rect([1, 1, 1], [0, 0, 2], [0, 2, 0]), M.Diffuse([0.2, 0.8, 0.2]))
    # front wall z=2 with a hole x in [-0.25,0.25], y in [0.75,1.25]
    sc.add(S.Rect([-0.625, 1, 2], [0.75, 0, 0], [0, 2, 0]), "w")
    sc.add(S.Rect([0.625, 1, 2], [0.75, 0, 0], [0, 2, 0]), "w")
    sc.add(S.Rect([0, 1.625, 2], [0.25, 0, 0], [0, 0.75, 0]), "w")
    sc.add(S.Rect([0, 0.375, 2], [0.25, 0, 0], [0, 0.75, 0]), "w")
    # alcove z in [2, 2.6] with the emitter on its back wall, facing -z
    sc.add(S.Rect([0, 0.9, 2.3], [0.4, 0, 0], [0, 0, 0.3]), "w")
    sc.add(S.Rect([0, 1.3, 2.3], [0.4, 0, 0], [0, 0, 0.3]), "w")
    sc.add(S.Rect([-0.4, 1.1, 2.3], [0, 0, 0.3], [0, 0.4, 0]), "w")
    sc.add(S.Rect([0.4, 1.1, 2.3], [0, 0, 0.3], [0, 0.4, 0]), "w")
    sc.add(S.Rect([0, 1.0, 2.59], [0, 0.3, 0], [0.3, 0, 0]),
           M.Emissive([60.0, 55.0, 45.0]))
    sc.set(ThinLenCamera(Film([res, res], "uncharted2"),
                         [0, 1, -1.8], [0, 1, 0], 0.45))
    return sc


def test_guided_tree_learns_transport(monkeypatch):
    """End-to-end adaptive-guiding gate: after render_guided trains on the
    alcove scene, the floor leaf's quadtree must concentrate probability on
    directions toward the wall opening and starve the downward hemisphere.

    spatial_k shrinks from the reference's 4000 (guidedpath.cpp:73, tuned
    for production film sizes) so the test-sized film still separates floor
    from ceiling leaves; everything else runs the shipping path."""
    import jax.numpy as jnp

    from pine_tpu.integrators import guidedpath as G
    from pine_tpu.integrators import guiding_tree as T

    orig = T.GuidingTree

    class SmallK(orig):
        def __init__(self, lo, hi, n_initial_samples, spatial_k=4000):
            super().__init__(lo, hi, n_initial_samples, spatial_k=400)

    monkeypatch.setattr(T, "GuidingTree", SmallK)
    monkeypatch.setenv("PINE_GUIDE_STRUCT", "tree")
    res, spp = 24, 24
    scene = alcove_scene(res)
    cscene = scene.compile()
    img = np.asarray(
        G.render_guided(cscene, scene.camera, res, res, BlueSampler(spp), spp, 4, 16)
    )
    assert np.isfinite(img).all() and img.mean() > 0.05
    gt = G._LAST_TREE
    assert gt is not None and gt.n_spatial_leaves() >= 8
    st = gt.device_state()
    p = jnp.asarray([[0.0, 0.02, 1.2]], jnp.float32)  # floor, front of hole
    droot, _, _ = T.stree_lookup(
        st["schild"], st["sdroot"], jnp.asarray(gt.lo), jnp.asarray(gt.inv_diag),
        jnp.float32(gt.footprint0), p,
    )
    hole = np.asarray([0.0, 1.0, 2.0]) - np.asarray([0.0, 0.02, 1.2])
    hole /= np.linalg.norm(hole)

    def sq_pdf(w):  # pdf over the unit square: 1.0 == uniform sphere
        sq = G.dir_to_square(jnp.asarray([w], jnp.float32))
        return float(T.dtree_pdf(st["dchild"], st["dflux"], droot, sq)[0])

    p_hole = sq_pdf(hole)
    p_down = sq_pdf([0.0, -1.0, 0.0])
    # measured 1.96 vs 6e-4 on this scene; wide margins for sampler changes
    assert p_hole > 1.2, (p_hole, p_down)
    assert p_down < 0.3, (p_hole, p_down)

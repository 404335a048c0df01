"""Golden-image RMSE gates + BXDF white-furnace + sampler chi-square tests
(VERDICT r1 item 3; reference metric hooks: image.cpp:64-67).

The cbox golden test renders the README scene and compares against the
reference's own gallery render (downsampled to average away MC noise); it
fails on the class of bug round 1 shipped (striping on the OBB/cone region,
wrong GI tint)."""
from __future__ import annotations

import os

import numpy as np
import pytest

REF_GALLERY = "/root/reference/gallery"


def _downsample(img, f):
    h, w = img.shape[:2]
    img = img[: h - h % f, : w - w % f]
    return img.reshape(h // f, f, w // f, f, -1).mean(axis=(1, 3))


def _render_cbox(res, spp):
    import bench
    from pine_tpu.core.samplers import BlueSampler
    from pine_tpu.integrators.path import render_wavefront
    from pine_tpu.prl.interp import Interpreter

    itp = Interpreter()
    itp.run(bench.CBOX_PRL, "<golden:cbox>")
    scene = itp.get_var("scene")
    scene.camera.film.width = scene.camera.film.height = res
    cscene = scene.compile()
    img = render_wavefront(cscene, scene.camera, res, res, BlueSampler(spp), spp, 4)
    return np.asarray(img)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_GALLERY, "cbox.png")),
    reason="reference gallery unavailable",
)
def test_golden_cbox_rmse_vs_reference():
    from PIL import Image

    from pine_tpu.core import color

    res, spp = 128, 8
    img = _render_cbox(res, spp)
    assert np.isfinite(img).all()
    ours = np.clip(np.asarray(color.uncharted2_filmic(img)), 0.0, 1.0) ** (1.0 / 2.2)
    ours = ours[::-1]  # disk PNGs are Y-flipped (fileio.cpp)

    ref = np.asarray(Image.open(os.path.join(REF_GALLERY, "cbox.png")))[..., :3]
    ref = ref.astype(np.float32) / 255.0

    # both to 32x32: averages MC noise well below the gate
    ours_small = _downsample(ours, res // 32)
    ref_small = _downsample(ref, ref.shape[0] // 32)
    rmse = float(np.sqrt(np.mean((ours_small - ref_small) ** 2)))
    # MC noise at 8spp downsampled 4x ~ 0.01; structural bugs (wrong walls,
    # striping, missing GI) push this over 0.1
    assert rmse < 0.06, f"cbox RMSE vs reference gallery = {rmse:.4f}"


# ---------------------------------------------------------------- furnace ----

def _furnace(tag_name, albedo, roughness, ior, n=120_000, seed=7, wi_z=0.6):
    """Estimate integral of f*cos/pdf over BXDF samples with white albedo ->
    must be <= 1 and near 1 for energy-preserving lobes."""
    import jax.numpy as jnp

    from pine_tpu.core import rng
    from pine_tpu.scene import bxdf as B
    from pine_tpu.scene import materials as M

    tag = getattr(M, tag_name)
    k = jnp.arange(n, dtype=jnp.uint32)
    u2 = jnp.stack([rng.uniform(k, jnp.uint32(seed), jnp.uint32(0)),
                    rng.uniform(k, jnp.uint32(seed), jnp.uint32(1))], -1)
    u1 = rng.uniform(k, jnp.uint32(seed), jnp.uint32(2))
    u2b = jnp.stack([rng.uniform(k, jnp.uint32(seed), jnp.uint32(3)),
                     rng.uniform(k, jnp.uint32(seed), jnp.uint32(4))], -1)
    state = dict(
        tag=jnp.full((n,), tag, jnp.int32),
        albedo=jnp.full((n, 3), albedo, jnp.float32),
        roughness=jnp.full((n,), roughness, jnp.float32),
        ior=jnp.full((n,), ior, jnp.float32),
    )
    sz = float(np.sqrt(1.0 - wi_z * wi_z))
    wi = jnp.broadcast_to(jnp.asarray([sz, 0.0, wi_z], jnp.float32), (n, 3))
    s = B.sample(state, wi, u2, u1, u2b)
    cos = jnp.abs(s["wo"][:, 2])
    term = jnp.where(
        s["valid"][:, None],
        s["f"] * (cos / jnp.maximum(s["pdf"], 1e-20))[:, None],
        0.0,
    )
    return float(jnp.mean(term[:, 0]))


def test_furnace_diffuse():
    e = _furnace("BX_DIFFUSE", 1.0, 0.5, 1.4)
    assert abs(e - 1.0) < 0.02, e


def test_furnace_conductor():
    # GGX conductor with white F0: single-scatter energy <= 1, and most of it
    # retained at moderate roughness (no multiple-scatter compensation)
    e = _furnace("BX_CONDUCTOR", 1.0, 0.3, 1.4)
    assert 0.8 < e <= 1.02, e


def test_furnace_conductor_smooth():
    e = _furnace("BX_CONDUCTOR", 1.0, 0.05, 1.4)
    assert 0.93 < e <= 1.02, e


def test_furnace_diffusive_dielectric():
    e = _furnace("BX_DIFF_DIELECTRIC", 1.0, 0.4, 1.4)
    assert 0.75 < e <= 1.02, e


def test_furnace_refractive():
    e = _furnace("BX_REFRACTIVE", 1.0, 0.2, 1.5)
    assert 0.8 < e <= 1.05, e


# ------------------------------------------------------------- sampler chi2 --

@pytest.mark.parametrize("name", ["uniform", "halton", "sobol", "blue"])
def test_sampler_chi_square_uniformity(name):
    import jax.numpy as jnp

    from pine_tpu.core import samplers as S

    cls = {
        "uniform": S.UniformSampler,
        "halton": S.HaltonSampler,
        "sobol": S.SobolSampler,
        "blue": S.BlueSampler,
    }[name]
    spp = 16
    smp = cls(spp)
    W = H = 32
    ys, xs = np.divmod(np.arange(W * H, dtype=np.int64), W)
    xs = jnp.asarray(xs, jnp.int32)
    ys = jnp.asarray(ys, jnp.int32)
    vals = []
    for i in range(spp):
        for dim in (0, 5):
            vals.append(np.asarray(smp.u1(xs, ys, i, dim)))
    v = np.concatenate(vals)
    assert ((v >= 0.0) & (v < 1.0)).all()
    bins = 32
    counts, _ = np.histogram(v, bins=bins, range=(0.0, 1.0))
    expected = len(v) / bins
    chi2 = float(np.sum((counts - expected) ** 2 / expected))
    # dof=31; mean 31, std ~7.9 for iid uniforms. Low-discrepancy sequences
    # are MORE uniform than random (chi2 << dof); gate only the upper tail.
    assert chi2 < 75.0, f"{name}: chi2={chi2:.1f} counts={counts}"


def test_sampler_2d_stratification():
    """Sobol/Blue u2 should cover the unit square more evenly than random."""
    import jax.numpy as jnp

    from pine_tpu.core import samplers as S

    smp = S.SobolSampler(64)
    xs = jnp.zeros((1,), jnp.int32)
    ys = jnp.zeros((1,), jnp.int32)
    pts = np.stack(
        [np.asarray(smp.u2(xs, ys, i, 0))[0] for i in range(64)]
    )
    # each of the 8x8 strata should hold exactly one point for a (0,2)-sequence
    cells = (pts // 0.125).astype(int)
    occupied = len({(a, b) for a, b in cells})
    assert occupied >= 56, f"poor 2D stratification: {occupied}/64 cells"


def test_bluesobol_exact_tables():
    """BlueSampler must be bit-identical to the reference's
    bluenoise_<spp>spp() (contrib/bluesobol + sampler.cpp:110-143)."""
    import jax.numpy as jnp

    from pine_tpu.core import samplers as Smod

    s = Smod.BlueSampler(16)
    assert s._bs_sobol is not None, "bluesobol table assets missing"
    d = np.load(
        os.path.join(os.path.dirname(Smod.__file__), "..", "assets", "bluesobol_16spp.npz")
    )
    sob = d["sobol"].astype(int)
    rank = d["ranking"].astype(int)
    scram = d["scrambling"].astype(int)

    def ref(i, j, idx, dim):
        i &= 127
        j &= 127
        idx &= 255
        dim &= 255
        ranked = idx ^ rank[(dim + (i + j * 128) * 8) % (128 * 128 * 8)]
        v = sob[dim + ranked * 256] ^ scram[(dim % 8) + (i + j * 128) * 8]
        return (0.5 + v) / 256.0

    px = jnp.asarray(np.arange(64) % 8, jnp.int32)
    py = jnp.asarray(np.arange(64) // 8, jnp.int32)
    for dim in (0, 1, 7, 33):
        ours = np.asarray(s.u1(px, py, 5, dim))
        want = np.array(
            [ref(int(x), int(y), 5, dim) for x, y in zip(np.asarray(px), np.asarray(py))]
        )
        assert np.allclose(ours, want), dim


# ---------------------------------------------------------- more goldens ----
# VERDICT r2 item 7: storm vs the reference gallery; cbox-indirect / sdf /
# classic pinned against committed goldens (the reference publishes no
# renders for those scenes); cbox raised to dual-scale gating.

REF_SCENES = "/root/reference/scenes"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

# README's draw() example (the Shadertoy-derived "storm" fragment) — the
# compat contract: this exact script must run unchanged (SURVEY Appendix A).
STORM_PRL = """
image_size = [640, 640];

draw(image_size, (u: vec2): vec3 {
    u *= image_size;
    v = vec2(image_size);
    u = 0.2 * (2 * u - v) / v.y;
    w = u;

   o = [1, 2, 3.0];
   z = o;
   a = 0.5;
   t = 4.2;
    for i in 0..19 {
        a += 0.03;
        t += 1;
        t2 = vec2(t);
        v = cos(t2 - 7 * u * pow(a, i)) - 5 * u;
        m = mat2(cos(vec2(i + 0.02 * t) - vec2(0, 11)), cos(vec2(i + 0.02 * t) - vec2(33, 0)));
        u = m * u;
        u += tanh(40 * dot(u, u) * cos(100 * [u.y, u.x] + t2)) / 200
           + 0.2 * a * u
           + cos(4 / exp(dot(o, o) / 100) + t) / 300;

        o += 0.4 * (vec3(1) + cos(z + vec3(t))) / length( (1 + i * length(v, v)) * sin(1.5 * u / (0.5 - dot(u, u)) - 9 * [u.y, u.x] + t2) );
    }

    w -= u;
   return pow((25.6 / (min(o, vec3(13)) + 164 / o) - dot(w, w) / 250), 4);
}).save("{OUT}");
"""


def _run_patched_scene(source, patches, out_png):
    from pine_tpu.prl.interp import Interpreter

    for a, b in patches:
        assert a in source, f"golden patch target missing: {a!r}"
        source = source.replace(a, b)
    itp = Interpreter(out=lambda s: None)
    itp.run(source, "<golden>")
    return itp


def _finalized(itp):
    from pine_tpu.core import color  # noqa: F401

    scene = itp.get_var("scene")
    return np.asarray(scene.camera.film.finalized_device())


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_GALLERY, "storm.png")),
    reason="reference gallery unavailable",
)
def test_golden_storm_vs_reference(tmp_path):
    """The storm draw() fragment is deterministic: gate tightly against the
    reference's own gallery render (gallery/storm.png)."""
    from PIL import Image

    out = str(tmp_path / "storm.png")
    _run_patched_scene(STORM_PRL.replace("{OUT}", out), [], out)
    ours = np.asarray(Image.open(out))[..., :3].astype(np.float32) / 255.0
    ref = np.asarray(
        Image.open(os.path.join(REF_GALLERY, "storm.png"))
    )[..., :3].astype(np.float32) / 255.0
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    small_o = _downsample(ours, 8)
    small_r = _downsample(ref, 8)
    rmse = float(np.sqrt(np.mean((small_o - small_r) ** 2)))
    assert rmse < 0.04, f"storm RMSE vs reference gallery = {rmse:.4f}"


def _golden_gate(name, render_fn, rmse_bound=0.02):
    """Pin `render_fn()` against the committed golden; regenerate with
    PINE_REGEN_GOLDENS=1 (inspect the image before committing!)."""
    img = render_fn()
    assert np.isfinite(img).all()
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if os.environ.get("PINE_REGEN_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img.astype(np.float16))
        pytest.skip(f"regenerated golden {name}")
    assert os.path.exists(path), f"golden missing: run PINE_REGEN_GOLDENS=1"
    ref = np.load(path).astype(np.float32)
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < rmse_bound, f"{name} RMSE vs committed golden = {rmse:.4f}"


def test_golden_cbox_indirect():
    def render():
        src = open(os.path.join(REF_SCENES, "cbox-indirect.pine")).read()
        itp = _run_patched_scene(
            src,
            [
                ("image_size := [720, 360]", "image_size := [72, 36]"),
                ("BlueSampler(64)", "BlueSampler(16)"),
                ('scene.camera.film().save("images/cbox0.png");', ""),
            ],
            None,
        )
        return _finalized(itp)

    _golden_gate("cbox_indirect_72x36x16", render, rmse_bound=0.02)


def test_golden_sdf_scene():
    def render():
        src = open(os.path.join(REF_SCENES, "sdf.pine")).read()
        itp = _run_patched_scene(
            src,
            [
                ("image_size = [640, 480]", "image_size = [96, 72]"),
                ('scene.camera.film().save("images/sdf.png");', ""),
            ],
            None,
        )
        return _finalized(itp)

    _golden_gate("sdf_96x72x16", render, rmse_bound=0.02)


def test_golden_classic_path():
    """classic.pine rendered with the PathIntegrator (the reference script's
    commented-out alternative) — pins Uber/Subsurface/Checkerboard/Disk."""

    def render():
        src = open(os.path.join(REF_SCENES, "classic.pine")).read()
        itp = _run_patched_scene(
            src,
            [
                ("image_size = [720, 360]", "image_size = [96, 48]"),
                ("MicroRenderGI(1024 * 2).render(scene);",
                 "PathIntegrator(BlueSampler(16), 5).render(scene);"),
                ('scene.camera.film().save("images/classic.png");', ""),
            ],
            None,
        )
        return _finalized(itp)

    _golden_gate("classic_path_96x48x16", render, rmse_bound=0.02)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_GALLERY, "cbox.png")),
    reason="reference gallery unavailable",
)
def test_golden_cbox_rmse_vs_reference_64():
    """Dual-scale cbox gate: 64x64 catches finer structure than the 32x32
    gate (e.g. box edge placement, contact shadows)."""
    from PIL import Image

    from pine_tpu.core import color

    res, spp = 128, 8
    img = _render_cbox(res, spp)
    ours = np.clip(np.asarray(color.uncharted2_filmic(img)), 0.0, 1.0) ** (1.0 / 2.2)
    ours = ours[::-1]
    ref = np.asarray(Image.open(os.path.join(REF_GALLERY, "cbox.png")))[..., :3]
    ref = ref.astype(np.float32) / 255.0
    ours_small = _downsample(ours, res // 64)
    ref_small = _downsample(ref, ref.shape[0] // 64)
    rmse = float(np.sqrt(np.mean((ours_small - ref_small) ** 2)))
    assert rmse < 0.08, f"cbox 64x64 RMSE vs reference gallery = {rmse:.4f}"

"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from pine_tpu.core.samplers import UniformSampler
from pine_tpu.integrators.path import render_wavefront
from pine_tpu.parallel.distributed import (
    make_device_mesh,
    render_sample_sharded,
    render_tile_sharded,
)


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8,
    reason="xla_force_host_platform_device_count=8 did not take effect",
)


@pytest.fixture(scope="module")
def cbox():
    scene = ge._build_cbox(32)
    return scene, scene.compile()


def test_entry_compiles(cbox):
    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


@needs_8
def test_sample_sharded_matches_single_device(cbox):
    scene, cscene = cbox
    mesh = make_device_mesh(8)
    assert mesh.devices.size == 8
    sampler = UniformSampler(8)
    img_sharded = render_sample_sharded(
        cscene, scene.camera, 32, 32, sampler, 8, 3, mesh
    )
    img_single = render_wavefront(cscene, scene.camera, 32, 32, sampler, 8, 3)
    # identical sample set split across devices -> same mean
    assert np.allclose(np.asarray(img_sharded), np.asarray(img_single), atol=2e-4)


@needs_8
def test_tile_sharded_matches_single_device(cbox):
    scene, cscene = cbox
    mesh = make_device_mesh(8)
    assert mesh.devices.size == 8
    sampler = UniformSampler(4)
    img_sharded = render_tile_sharded(
        cscene, scene.camera, 32, 32, sampler, 4, 3, mesh
    )
    img_single = render_wavefront(cscene, scene.camera, 32, 32, sampler, 4, 3)
    assert np.allclose(np.asarray(img_sharded), np.asarray(img_single), atol=2e-4)


@needs_8
def test_dryrun_multichip():
    ge.dryrun_multichip(8)

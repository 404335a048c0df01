"""2-process DCN film reduce (SURVEY §5.8): two jax.distributed processes
each render their sample shard of a tiny scene; the psum film must match a
single-process render of all samples bit-for-bit (same stateless sample set,
deterministic reduction order per shard)."""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np
# worker processes must NOT inherit the test session's 8-device fakery:
# each contributes 2 devices -> 4 global
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from pine_tpu.parallel import multihost

rank = int(sys.argv[1])
port = sys.argv[2]
out = sys.argv[3]
multihost.initialize(f"localhost:{port}", num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

from pine_tpu.core.camera import ThinLenCamera
from pine_tpu.core.film import Film
from pine_tpu.core.samplers import UniformSampler
from pine_tpu.scene import materials as M, shapes as S
from pine_tpu.scene.scene import Scene

sc = Scene()
sc.add(S.Rect([0, 2, 0], [1, 0, 0], [0, 0, 1]), M.Emissive([10, 10, 10]))
sc.add(S.Sphere([0, 0, 0], 0.5), M.Diffuse([0.7, 0.6, 0.5]))
sc.add(S.Plane([0, -0.5, 0], [0, 1, 0]), M.Diffuse([0.8, 0.8, 0.8]))
sc.set(ThinLenCamera(Film([8, 8]), [0, 0.6, -2.5], [0, 0, 0], 0.5))

img = multihost.render_multihost(sc.compile(), sc.camera, 8, 8, UniformSampler(4), 4, 2)
np.save(out, np.asarray(img))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_film_reduce(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"film_{r}.npy") for r in (0, 1)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(r), str(port), outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for r in (0, 1)
    ]
    logs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    films = [np.load(o) for o in outs]
    # both hosts hold the same reduced film
    np.testing.assert_array_equal(films[0], films[1])
    assert np.isfinite(films[0]).all() and films[0].max() > 0.0

    # single-process reference over the same 4 samples on a 4-device mesh
    import jax

    from pine_tpu.core.camera import ThinLenCamera
    from pine_tpu.core.film import Film
    from pine_tpu.core.samplers import UniformSampler
    from pine_tpu.parallel.distributed import make_device_mesh, render_sample_sharded
    from pine_tpu.scene import materials as M, shapes as S
    from pine_tpu.scene.scene import Scene

    sc = Scene()
    sc.add(S.Rect([0, 2, 0], [1, 0, 0], [0, 0, 1]), M.Emissive([10, 10, 10]))
    sc.add(S.Sphere([0, 0, 0], 0.5), M.Diffuse([0.7, 0.6, 0.5]))
    sc.add(S.Plane([0, -0.5, 0], [0, 1, 0]), M.Diffuse([0.8, 0.8, 0.8]))
    sc.set(ThinLenCamera(Film([8, 8]), [0, 0.6, -2.5], [0, 0, 0], 0.5))
    mesh = make_device_mesh(4)
    ref = np.asarray(
        render_sample_sharded(sc.compile(), sc.camera, 8, 8, UniformSampler(4), 4, 2, mesh)
    )
    np.testing.assert_allclose(films[0], ref, rtol=2e-5, atol=2e-6)

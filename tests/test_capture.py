"""core/capture.py: the walker must find every device array reachable from
scene-like object graphs (a missed capture silently poisons TPU dispatch)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pine_tpu.core.capture import bind, collect_device_arrays


class Obj:
    pass


def test_collect_finds_attrs_dicts_lists_and_cells():
    a = jnp.ones((4,))
    b = jnp.zeros((2, 3))
    c = jnp.arange(5)
    d = jnp.ones((1,))

    root = Obj()
    root.direct = a
    root.nested = {"k": b, "list": [c, "str", 42]}
    root.np_ignored = np.ones(3)

    def closure_fn(x):
        return x + d  # d captured in a closure cell

    root.fn = closure_fn

    arrays, setters = collect_device_arrays((root,))
    assert len(arrays) == 4
    shapes = sorted(tuple(x.shape) for x in arrays)
    assert shapes == [(1,), (2, 3), (4,), (5,)]


def test_bind_swaps_and_restores():
    root = Obj()
    root.x = jnp.ones((3,))
    arrays, setters = collect_device_arrays((root,))
    replacement = [jnp.zeros((3,))]
    with bind(setters, replacement):
        assert float(root.x.sum()) == 0.0
    assert float(root.x.sum()) == 3.0


def test_scene_capture_covers_compiled_tables():
    """Every device array in a compiled scene must be collected (spot-check
    the accel group tables and sampler tables)."""
    import __graft_entry__ as ge
    from pine_tpu.core.samplers import BlueSampler

    scene = ge._build_cbox(16)
    cscene = scene.compile()
    sampler = BlueSampler(4)
    arrays, setters = collect_device_arrays((cscene, sampler))
    ids = {id(x) for x in arrays}
    for tid, tab in cscene.tables.items():
        assert id(tab) in ids, f"type table {tid} not captured"
    assert id(cscene.g_mat_dev) in ids
    if sampler._bs_sobol is not None:
        assert id(sampler._bs_sobol) in ids

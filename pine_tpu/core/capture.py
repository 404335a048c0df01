"""Device-array capture/bind: make closures jit-argument-clean.

On the tunneled TPU backend, a jitted function that CLOSES OVER a device
array — any size, even (3,) — permanently drops the process into a ~1000x
slow dispatch mode (measured: 0.03ms -> 30ms per call for every subsequent
program).  Producing a single NaN anywhere does the same.  The renderer's
scene/sampler/accel state therefore must reach jit as *arguments*, never as
captured constants.

This module walks an object graph (scene, samplers, accel dicts, traced-PRL
closures), collects every reachable jax.Array leaf with a rebinding handle
(dict item / list item / attribute / closure cell), and provides a context
manager that temporarily swaps tracers into those slots while a jit trace
runs:

    arrays, setters = collect_device_arrays((cscene, sampler, cam_params))

    def fn(xs, vals):
        with bind(setters, vals):
            return render_body(xs)      # reads state through the objects

    jax.jit(fn)(xs, arrays)             # arrays passed as real arguments

Subsequent calls hit the jit cache; the objects hold their original arrays
again (bind restores on exit), so host-side code is unaffected.
"""
from __future__ import annotations

import types

import numpy as np


def _is_device_array(x):
    import jax

    return isinstance(x, jax.Array)


def collect_device_arrays(roots, max_depth=12):
    """-> (arrays list, setters list).  setters[i] rebinds slot i."""
    seen = set()
    arrays = []
    setters = []

    def visit(obj, depth):
        if depth > max_depth:
            return
        oid = id(obj)
        if oid in seen:
            return
        seen.add(oid)
        if _is_device_array(obj) or isinstance(obj, (str, bytes, np.ndarray)):
            return
        if isinstance(obj, dict):
            for k in list(obj.keys()):
                v = obj[k]
                if _is_device_array(v):
                    arrays.append(v)
                    setters.append(("item", obj, k))
                else:
                    visit(v, depth + 1)
        elif isinstance(obj, list):
            for i, v in enumerate(obj):
                if _is_device_array(v):
                    arrays.append(v)
                    setters.append(("item", obj, i))
                else:
                    visit(v, depth + 1)
        elif isinstance(obj, tuple):
            for v in obj:
                if _is_device_array(v):
                    # tuples are immutable: no setter exists, so this array
                    # CANNOT be rebound and would reach jit as a captured
                    # device constant — which permanently poisons dispatch
                    # ~1000x on this backend.  Fail loudly instead of
                    # silently re-introducing that regression (ADVICE r2).
                    raise TypeError(
                        "collect_device_arrays: device array held by an "
                        "immutable tuple cannot be rebound as a jit argument; "
                        "store it in a list/dict/attribute instead "
                        f"(tuple: {obj!r:.120})"
                    )
                visit(v, depth + 1)
        elif isinstance(obj, types.FunctionType):
            if obj.__closure__:
                for cell in obj.__closure__:
                    try:
                        v = cell.cell_contents
                    except ValueError:
                        continue
                    if _is_device_array(v):
                        arrays.append(v)
                        setters.append(("cell", cell, None))
                    else:
                        visit(v, depth + 1)
        elif isinstance(obj, types.MethodType):
            visit(obj.__func__, depth + 1)
            visit(obj.__self__, depth + 1)
        elif hasattr(obj, "__dict__"):
            d = vars(obj)
            skip = getattr(type(obj), "_capture_skip", ())
            for k in list(d.keys()):
                if k in skip:
                    continue  # render OUTPUTS (e.g. Film's accumulated frame)
                v = d[k]
                if _is_device_array(v):
                    arrays.append(v)
                    setters.append(("attr", obj, k))
                else:
                    visit(v, depth + 1)

    for r in roots:
        visit(r, 0)
    return arrays, setters


class bind:
    """Temporarily install `values` into the collected slots (for tracing)."""

    def __init__(self, setters, values):
        assert len(setters) == len(values)
        self.setters = setters
        self.values = values
        self._saved = None

    def _get(self, s):
        kind, container, key = s
        if kind == "item":
            return container[key]
        if kind == "attr":
            return getattr(container, key)
        return container.cell_contents

    def _set(self, s, v):
        kind, container, key = s
        if kind == "item":
            container[key] = v
        elif kind == "attr":
            setattr(container, key, v)
        else:
            container.cell_contents = v

    def __enter__(self):
        self._saved = [self._get(s) for s in self.setters]
        for s, v in zip(self.setters, self.values):
            self._set(s, v)
        return self

    def __exit__(self, *exc):
        for s, v in zip(self.setters, self._saved):
            self._set(s, v)
        return False

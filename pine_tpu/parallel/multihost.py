"""DCN multi-host rendering (SURVEY.md §5.8).

The reference is single-node shared-memory only (core/parallel.h); the
TPU-native scale-out across hosts is the same SPMD program as the ICI path:
``jax.distributed.initialize`` wires the processes together, every process
runs the identical sample-sharded wavefront over a mesh of ALL global
devices, and the one collective — a ``psum`` of per-shard film accumulations
(parallel/distributed.py) — rides DCN.  No parameter-server machinery is
needed: the only cross-host traffic is one film-sized allreduce per render
(plus optional guiding-grid merges).

Env wiring (each host sets):
    PINE_COORDINATOR  host:port of process 0
    PINE_NUM_PROCS    total process count
    PINE_PROC_ID      this process's rank
"""
from __future__ import annotations

import os


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Wire up jax.distributed from args or PINE_* env vars.  Safe to call
    once per process, before any other jax usage."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("PINE_COORDINATOR")
    num_processes = num_processes or _int_env("PINE_NUM_PROCS")
    process_id = process_id if process_id is not None else _int_env("PINE_PROC_ID")
    if coordinator_address is None:
        # single-host fallback: nothing to wire (ICI path handles one host)
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name):
    v = os.environ.get(name)
    return None if v is None else int(v)


def global_mesh(axis="d"):
    """One mesh over every device of every process (DCN + ICI)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def render_multihost(cscene, cam, W, H, sampler, spp, max_depth, axis="d"):
    """Sample-sharded render over all global devices; the psum film reduce
    crosses DCN.  Every process returns the full (replicated) film."""
    from pine_tpu.parallel.distributed import render_sample_sharded

    mesh = global_mesh(axis)
    return render_sample_sharded(
        cscene, cam, W, H, sampler, spp, max_depth, mesh, axis=axis
    )

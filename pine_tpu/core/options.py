"""Process-wide render options set by the CLI (there is no flag system in
the reference — the .pine script is the config, SURVEY §5.6 — so the few
TPU-runtime knobs that make no sense as scene code live here).

``progressive_every``: if set, PathIntegrator renders in sample batches of
this size and writes a tone-mapped film snapshot after each batch — the
TPU-native analog of the reference's interactive accumulation viewer
(path_opengl.cpp:11-127).  Snapshots flush to disk live on every backend:
the CLI engages the tunneled TPU's synchronous dispatch mode at startup
(core/device.py), in which a film readback is an ordinary ~50 ms transfer
rather than the queue-mode poison earlier rounds worked around.
"""
from __future__ import annotations

progressive_every = None  # int spp per snapshot, or None (off)
progressive_dir = "progressive"
interactive = False  # --interactive: terminal fly-camera loop after render


def progressive_flush_live():
    """Snapshots are written as produced.  CPU fences natively; on the
    tunneled TPU this requires sync dispatch mode (engaged by the CLI —
    core/device.engage_sync_dispatch)."""
    import jax

    if jax.default_backend() == "cpu":
        return True
    from pine_tpu.core import device

    return device._engaged

"""Process-wide render options set by the CLI (there is no flag system in
the reference — the .pine script is the config, SURVEY §5.6 — so the few
TPU-runtime knobs that make no sense as scene code live here).

``progressive_every``: if set, PathIntegrator renders in sample batches of
this size and queues a tone-mapped film snapshot after each batch — the
TPU-native analog of the reference's interactive accumulation viewer
(path_opengl.cpp:11-127).  On CPU backends snapshots flush to disk as they
are produced (watch the render refine); on TPU they stay queued on device
until script end, because any device->host readback permanently poisons
this backend's dispatch path (core/capture.py).
"""
from __future__ import annotations

progressive_every = None  # int spp per snapshot, or None (off)
progressive_dir = "progressive"
interactive = False  # --interactive: terminal fly-camera loop after render


def progressive_flush_live():
    """Snapshots may be written immediately only when readbacks are free."""
    import jax

    return jax.default_backend() == "cpu"

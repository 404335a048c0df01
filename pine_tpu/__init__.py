"""pine_tpu — a TPU-native rebuild of the Pine rendering framework.

Pine (reference: wicstas/pine) is a CPU path-tracing library driven by a
JIT-compiled scene language (PRL).  pine_tpu re-designs it TPU-first:

- geometry flattens to SoA device arrays (no pointer BVHs, no virtual dispatch)
- the recursive path-tracing megakernel becomes a masked wavefront loop inside
  one ``jax.jit`` program
- PRL keeps its grammar (reference src/pine/core/jit.cpp:1467-2210) but the
  backend retargets from LLVM codegen to eager Python evaluation for scene
  building plus ``jax``-tracing for hot lambdas (draw fragments, SDFs, texture
  nodes)
- multi-chip scaling uses ``jax.sharding`` over sample/film shards instead of
  threads+atomics (reference src/pine/core/parallel.h).
"""

__version__ = "0.1.0"

from pine_tpu.prl.interp import interpret, interpret_file  # noqa: F401

"""peregrine_tpu — a TPU-native OLC genome assembler for accurate long reads.

A from-scratch re-design of the Peregrine assembler (SHIMMER hierarchical
minimizer index + overlap + string-graph layout + FALCON-style consensus)
built for TPU hardware: the compute path is JAX/XLA/Pallas array programs
over sharded device arrays; the host runtime (I/O, graph layout, stage
orchestration) is Python + native C++ extensions.

Reference capability map: see SURVEY.md at the repo root.  File-format
compatibility targets the reference's on-disk ABI (SURVEY.md §2.4) so that
outputs can be validated against the reference pipeline.
"""

import jax

# 56-bit minimizer hashes and packed (hash, rid, pos, strand) records need
# 64-bit integer lanes; enable x64 once, package-wide, before any tracing.
jax.config.update("jax_enable_x64", True)

# Persistent-compile-cache keys must not depend on WHO calls a kernel:
# lowered modules (and especially the serialized Mosaic payloads inside
# tpu_custom_call backend_configs) embed the full caller traceback by
# default, so the same jit invoked from a different script — or after any
# line-number shift in a caller — got a fresh cache key and a full remote
# recompile (measured 250-700 s per stall on the axon tunnel).  Stripping
# tracebacks from locations makes the lowering byte-identical across call
# paths (verified by diffing lowered text from structurally different
# callers).
jax.config.update("jax_include_full_tracebacks_in_locations", False)

# Persistent compile cache: remote-backend compiles cost 20-450 s each
# through the tunnel, so every entry point must reuse them.  Set here,
# package-wide, unless the caller already chose a directory.
if not jax.config.jax_compilation_cache_dir:
    import os as _os
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.expanduser("~/.cache/jax_comp"))

__version__ = "0.1.0"

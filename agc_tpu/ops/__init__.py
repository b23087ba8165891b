"""Device (JAX/XLA/Pallas) kernels for the hot compute stages.

- 64-bit integers are required for k-mer codes (2k bits, k up to 32).
- A persistent compilation cache is enabled: kernel shapes are bucketed
  (see kmers._bucket_size), so the working set of executables is small and
  reused across runs -- important when compilation is remote (tunneled
  TPU) or slow.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

_CACHE_DIR = os.environ.get(
    "AGC_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/agc_tpu_jax")
)
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - older jax without these options
    pass

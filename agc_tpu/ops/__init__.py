"""Device (JAX/XLA/Pallas) kernels for the hot compute stages.

64-bit integers are required for k-mer codes (2k bits, k up to 32).
"""

import jax

jax.config.update("jax_enable_x64", True)

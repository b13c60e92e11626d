"""Global JAX configuration for provekit-tpu.

Enables the persistent compilation cache so the large unrolled field-arithmetic
graphs compile once per machine, not once per process (the moral equivalent of
the reference shipping pre-generated .s kernels).
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "PROVEKIT_TPU_JAX_CACHE", os.path.expanduser("~/.cache/provekit_tpu_jax"))

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.4)

# Some TPU plugins (axon) register themselves ahead of JAX_PLATFORMS;
# PROVEKIT_TPU_PLATFORM=cpu[:N] forces the platform (and virtual device
# count) explicitly.
_platform = os.environ.get("PROVEKIT_TPU_PLATFORM")
if _platform:
    name, _, count = _platform.partition(":")
    jax.config.update("jax_platforms", name)
    if count and name == "cpu":
        jax.config.update("jax_num_cpu_devices", int(count))

"""Global JAX configuration for provekit-tpu.

Enables the persistent compilation cache so the large unrolled field-arithmetic
graphs compile once per machine, not once per process (the moral equivalent of
the reference shipping pre-generated .s kernels).
"""

import hashlib
import os

import jax


def _host_fingerprint() -> str:
    """Short hash of the host's CPU feature flags.

    XLA:CPU AOT cache entries embed the compile machine's features; loading
    an entry produced on a different host emits feature-mismatch warnings
    and can SIGILL/segfault mid-run (observed when a cache written on an
    avx512/amx host was reused on a narrower one).  Namespacing the cache
    per CPU-feature-set keeps entries host-valid; TPU entries are
    unaffected (same dir on the same chip type either way).
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:12]
    except OSError:
        pass
    return "nohost"


_CACHE_DIR = os.environ.get(
    "PROVEKIT_TPU_JAX_CACHE",
    os.path.expanduser(f"~/.cache/provekit_tpu_jax_{_host_fingerprint()}"))

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)

# Host<->device syncs are ~free on the CPU backend but cost ~30 ms each on
# tunneled TPU devices.  When CHEAP_SYNC is set (the multi-chip dryrun and
# other CPU-hermetic flows), "force device" paths (ntt/merkle/pow/eq eval)
# are demoted to size-gated host tails: on hosts where every distinct XLA
# compile costs ~0.4 s, a tiny prove otherwise spends minutes compiling
# hundreds of one-op executables.  Read via config.CHEAP_SYNC at call time
# so tests can flip it per-module.
CHEAP_SYNC = os.environ.get("PROVEKIT_TPU_CHEAP_SYNC", "") == "1"
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

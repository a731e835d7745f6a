"""Force tests onto a virtual 8-device CPU mesh (no TPU needed, hermetic).

Note: this environment's sitecustomize imports jax and selects the axon TPU
backend at interpreter startup, so plain env vars are too late — we must
override via jax.config before any backend is instantiated.
"""
import os
import resource

# The XLA CPU compiler recurses deeply on the big wavefront-scan programs
# (ss_scan.scan_encode_pss): the default 8 MiB main-thread stack can
# overflow mid-compile (observed as a segfault in backend_compile_and_load
# late in long suite runs). Raise the soft limit as far as allowed.
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
# Persistent compilation cache. Serializing the very largest wavefront-scan
# executables has segfaulted inside the cache-write path
# (jax compilation_cache.put_executable_and_time -> zstd) on this host, so
# cache writes are size-capped below via a monkeypatch; set HHT_NO_CCACHE=1
# to disable the disk cache entirely.
if os.environ.get("HHT_NO_CCACHE") != "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA:CPU's executable.serialize() segfaults on the largest wavefront-scan
# programs (observed: Fatal Python error in
# compilation_cache.put_executable_and_time during cold-cache suite runs).
# Skip persistent-cache WRITES for those programs; everything else still
# caches, and reads are unaffected.
from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time
_NO_SERIALIZE = ("scan_encode", "scan_decode", "banded", "local")


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    if any(s in module_name for s in _NO_SERIALIZE):
        return
    return _orig_put(cache_key, module_name, executable, backend,
                     compile_time)


_cc.put_executable_and_time = _safe_put

"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 virtual devices (SURVEY.md §4 "Distributed without a
cluster").  Must be set before JAX initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the tunneled TPU ('axon') backend and
# pins jax_platforms at the config level, so the env var alone is not enough:
# force the simulated 8-device CPU platform through the config.
jax.config.update("jax_platforms", "cpu")

# XLA CPU compiles of the conv graphs dominate suite time; a persistent
# compilation cache makes every run after the first fast.  A cold container
# has no cache at all (18m19s measured for the fast tier on 1 vCPU), so the
# repo ships the fast tier's compiled programs in ci/test_cache (same scheme
# as ci/dryrun_cache): seed the writable gitignored .jax_cache from the
# committed entries, so a fresh checkout loads instead of compiles.  Stale
# seeds (after code edits) just miss and recompile — correctness unaffected.
_repo = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
_cache = os.path.join(_repo, ".jax_cache")
_seed = os.path.join(_repo, "ci", "test_cache")
if os.path.isdir(_seed):
    import shutil
    import tempfile

    os.makedirs(_cache, exist_ok=True)
    # Sweep temp files orphaned by a hard kill between mkstemp and os.replace
    # below.  Age-gated (1 h) so a concurrent xdist worker's in-flight temp is
    # never deleted from under its os.replace.
    import time as _time
    for _f in os.listdir(_cache):
        if ".seed." in _f:
            _p = os.path.join(_cache, _f)
            try:
                if _time.time() - os.path.getmtime(_p) > 3600:
                    os.unlink(_p)
            except OSError:
                pass  # another worker swept it first
    for _f in os.listdir(_seed):
        _src = os.path.join(_seed, _f)
        _dst = os.path.join(_cache, _f)
        # isfile: a stray subdirectory must not abort collection.
        if os.path.isfile(_src) and not os.path.exists(_dst):
            # Atomic publish: xdist workers run this concurrently, and an
            # interrupted plain copy would leave a truncated entry that the
            # exists-check then skips forever.  Write to a temp file in the
            # destination dir and os.replace() into place (same scheme JAX
            # itself uses for cache writes).
            _fd, _tmp = tempfile.mkstemp(dir=_cache, prefix=_f + ".seed.")
            try:
                with os.fdopen(_fd, "wb") as _out, open(_src, "rb") as _in:
                    shutil.copyfileobj(_in, _out)
                os.replace(_tmp, _dst)
            except BaseException:
                if os.path.exists(_tmp):
                    os.unlink(_tmp)
                raise
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 simulated devices, got {len(devs)}"
    return devs[:8]

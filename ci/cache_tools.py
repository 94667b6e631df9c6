"""Check / regenerate the committed compile-cache seeds.

The repo commits two persistent-compile-cache seeds so the driver's cold
1-vCPU container loads executables instead of compiling them:

  - ``ci/dryrun_cache``: the four ``jit_train_step`` programs of
    ``__graft_entry__.dryrun_multichip(8)`` (413 s cold vs 283 s warm).
  - ``ci/test_cache``: the fast test tier's programs, seeded into
    ``.jax_cache`` by ``tests/conftest.py`` (18m19s cold vs 11m05s seeded).

The persistent-cache key covers module metadata beyond the lowered HLO
(op locations etc. — see commit 58725ad), so ANY edit to entry/step code
silently stales the seeds and reverts the driver's dry run to ~390 s of
cold compiles (r3's rc=124 failure mode, MULTICHIP_r03.json).  These tools
make staleness a loud, checkable failure instead:

  python ci/cache_tools.py check         # AOT-compile the 4 dry-run
                                         # scenarios against the committed
                                         # seed; exit 1 on any cache MISS
  python ci/cache_tools.py regen         # recompile into a fresh dir and
                                         # replace ci/dryrun_cache
  python ci/cache_tools.py regen-tests   # rebuild ci/test_cache by running
                                         # the fast test tier cold

Run ``check`` after touching train/step/model/entry code and before handing
the repo to the driver; ``regen`` on a MISS.  Both force the simulated
8-device CPU platform themselves (no env vars needed) and run compile-only
(no scenario execution), so ``check`` against a fresh seed finishes in
~1-2 min warm on a 1-vCPU host vs the dry run's ~280 s.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DRYRUN_SEED = os.path.join(_REPO, "ci", "dryrun_cache")
_TEST_SEED = os.path.join(_REPO, "ci", "test_cache")
_N_DEVICES = 8  # the driver's dryrun_multichip geometry


def _compile_scenarios() -> int:
    """AOT-compile the dry-run scenarios in-process; return #scenario misses.

    ``dryrun_multichip`` (and thus ``_run_scenarios``) seeds the writable
    ``/tmp/xmc_jax_cache`` from ``ci/dryrun_cache`` itself, forces the
    simulated CPU platform, and sets ``jax_disable_most_optimizations`` —
    everything that shapes the cache key — so this wrapper only needs to
    import and call it.
    """
    sys.path.insert(0, _REPO)
    import __graft_entry__ as ge

    return ge._run_scenarios(_N_DEVICES, compile_only=True)


def cmd_check() -> int:
    misses = _compile_scenarios()
    if misses:
        print(
            f"\nSTALE: {misses}/4 dry-run scenarios missed the committed "
            f"compile cache — the driver's cold dryrun_multichip(8) would "
            f"recompile them (~390 s on 1 vCPU, the MULTICHIP_r03 rc=124 "
            f"failure mode).\nRegenerate the seed with:\n"
            f"    python ci/cache_tools.py regen\nand commit the result.",
            flush=True,
        )
        return 1
    print("\nFRESH: all dry-run scenarios hit the committed compile cache.")
    return 0


def cmd_regen() -> int:
    # Compile into a fresh writable dir with NO committed seed visible, so
    # the new entries are exactly what the current code produces.  The
    # in-process helper always uses /tmp/xmc_jax_cache and seeds it from
    # ci/dryrun_cache, so: park the committed seed, clear the tmp dir,
    # compile, harvest, restore.
    tmp_cache = "/tmp/xmc_jax_cache"
    parked = _DRYRUN_SEED + ".parked"
    if os.path.isdir(tmp_cache):
        shutil.rmtree(tmp_cache)
    os.rename(_DRYRUN_SEED, parked)
    os.makedirs(_DRYRUN_SEED)  # empty seed: every scenario compiles fresh
    try:
        _compile_scenarios()
        new = sorted(
            f for f in os.listdir(tmp_cache) if f.startswith("jit_train_step")
        )
        if not new:
            print("regen: no jit_train_step entries produced — aborting, "
                  "committed seed left unchanged")
            os.rmdir(_DRYRUN_SEED)
            os.rename(parked, _DRYRUN_SEED)
            return 1
        for f in new:
            shutil.copy(os.path.join(tmp_cache, f), os.path.join(_DRYRUN_SEED, f))
        shutil.rmtree(parked)
        print(f"\nregen: ci/dryrun_cache replaced with {len(new)} entries:")
        for f in new:
            sz = os.path.getsize(os.path.join(_DRYRUN_SEED, f))
            print(f"  {f} ({sz / 1e6:.1f} MB)")
        print("Verify with `python __graft_entry__.py dryrun 8` (expect "
              "'cache hit' on every scenario), then commit ci/dryrun_cache.")
        return 0
    except BaseException:
        # restore the parked seed on any failure
        if os.path.isdir(parked):
            if os.path.isdir(_DRYRUN_SEED):
                shutil.rmtree(_DRYRUN_SEED)
            os.rename(parked, _DRYRUN_SEED)
        raise


def cmd_regen_tests() -> int:
    """Rebuild ci/test_cache: run the fast tier cold and harvest .jax_cache.

    Slow (the point is to pay the cold compiles once); run on a quiet
    machine.  Entries are whatever the tier compiles for >1 s — the same
    min-compile-time threshold conftest configures.
    """
    jax_cache = os.path.join(_REPO, ".jax_cache")
    if os.path.isdir(jax_cache):
        shutil.rmtree(jax_cache)
    parked = _TEST_SEED + ".parked"
    os.rename(_TEST_SEED, parked)
    os.makedirs(_TEST_SEED)
    try:
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
             "-m", "not slow", "-p", "no:cacheprovider"],
            cwd=_REPO,
        )
        if rc != 0:
            print(f"regen-tests: fast tier failed (rc={rc}); committed seed "
                  "left unchanged")
            os.rmdir(_TEST_SEED)
            os.rename(parked, _TEST_SEED)
            return rc
        entries = sorted(os.listdir(jax_cache))
        for f in entries:
            src = os.path.join(jax_cache, f)
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(_TEST_SEED, f))
        shutil.rmtree(parked)
        print(f"regen-tests: ci/test_cache replaced with {len(entries)} "
              "entries; commit ci/test_cache.")
        return 0
    except BaseException:
        if os.path.isdir(parked):
            if os.path.isdir(_TEST_SEED):
                shutil.rmtree(_TEST_SEED)
            os.rename(parked, _TEST_SEED)
        raise


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "check"
    if cmd == "check":
        return cmd_check()
    if cmd == "regen":
        return cmd_regen()
    if cmd == "regen-tests":
        return cmd_regen_tests()
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())

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

Two non-obvious properties, both measured 2026-08-20: the persistent-cache
key covers the cache directory *path* (identical entries at a different
path all miss), so check/regen stash-and-restore the canonical
``/tmp/xmc_jax_cache`` rather than using a tempdir; and the check must
start from an empty dir seeded only with the committed entries, or leftovers
from a previous local dry run mask a stale seed as FRESH.
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

# The dry run's writable compile cache.  The persistent-cache key covers the
# cache *directory path* itself (measured 2026-08-20: entries copied to a
# different path all miss; the same entries at this path all hit), so both
# check and regen MUST run at the exact path the driver's dryrun uses —
# a throwaway tempdir can never match the committed entries.
_CANONICAL_CACHE = "/tmp/xmc_jax_cache"


class _stashed_canonical_cache:
    """Run the body against an EMPTY ``_CANONICAL_CACHE`` (seeded only by
    ``_run_scenarios`` from the committed entries), parking any existing warm
    cache and restoring it afterwards — entries a previous local run wrote
    there would otherwise satisfy every lookup and mask a stale seed."""

    def __enter__(self) -> str:
        self._stash = None
        stash = _CANONICAL_CACHE + ".stash"
        if os.path.isdir(stash):
            # Leftover from a hard kill mid-check: the stash holds the user's
            # real warm cache (parked by the interrupted run) and the
            # canonical path, if present, is that run's scratch.  Recover the
            # warm cache — deleting the stash here would destroy it and
            # recreate the cold-compile failure mode these tools prevent.
            print(f"recovering {os.path.basename(stash)} left by an "
                  f"interrupted run — it holds the parked warm cache")
            if os.path.isdir(_CANONICAL_CACHE):
                shutil.rmtree(_CANONICAL_CACHE)
            self._stash = stash
        elif os.path.isdir(_CANONICAL_CACHE):
            self._stash = stash
            os.rename(_CANONICAL_CACHE, stash)
        return _CANONICAL_CACHE

    def __exit__(self, *exc) -> None:
        if os.path.isdir(_CANONICAL_CACHE):
            shutil.rmtree(_CANONICAL_CACHE)
        if self._stash:
            os.rename(self._stash, _CANONICAL_CACHE)


def _compile_scenarios(cache_dir: str) -> tuple[int, int]:
    """AOT-compile the dry-run scenarios in-process.

    Returns ``(scenario_misses, scenario_total)``.  ``_run_scenarios`` seeds
    ``cache_dir`` from ``ci/dryrun_cache`` itself, forces the simulated CPU
    platform, and sets ``jax_disable_most_optimizations`` — everything that
    shapes the cache key — so this wrapper only needs to import and call it.
    """
    sys.path.insert(0, _REPO)
    import __graft_entry__ as ge

    misses = ge._run_scenarios(_N_DEVICES, compile_only=True,
                               cache_dir=cache_dir)
    return misses, len(ge._DRYRUN_SCENARIOS)


def _recover_parked(seed: str) -> None:
    """Make regen re-runnable after a hard kill (SIGKILL/OOM) mid-regen.

    A leftover ``<seed>.parked`` holds the last good committed seed; the
    seed dir itself may be empty or half-harvested.  Restore the parked
    copy before doing anything else.
    """
    parked = seed + ".parked"
    if os.path.isdir(parked):
        print(f"recovering {os.path.basename(parked)} left by an "
              f"interrupted regen — restoring it as the seed")
        if os.path.isdir(seed):
            shutil.rmtree(seed)
        os.rename(parked, seed)


class _parked_seed:
    """Park the committed seed dir while a regen harvests a fresh one.

    On entry: recover any ``.parked`` leftover from a hard kill, move the
    seed to ``<seed>.parked``, and create an empty seed dir for the harvest.
    The body must call :meth:`commit` once the harvest is complete and
    non-empty; otherwise (abort return, exception, or a forgotten commit)
    exit restores the parked committed seed unchanged.  Single source of
    truth for the park/restore dance — ``cmd_regen`` and ``cmd_regen_tests``
    previously hand-rolled two copies that could drift.
    """

    def __init__(self, seed: str) -> None:
        self._seed = seed
        self._parked = seed + ".parked"
        self._committed = False

    def __enter__(self) -> "_parked_seed":
        _recover_parked(self._seed)
        os.rename(self._seed, self._parked)
        os.makedirs(self._seed)  # empty seed: everything compiles fresh
        return self

    def commit(self) -> None:
        self._committed = True

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._committed and exc_type is None:
            shutil.rmtree(self._parked)
        elif os.path.isdir(self._parked):
            if os.path.isdir(self._seed):
                shutil.rmtree(self._seed)
            os.rename(self._parked, self._seed)


def cmd_check() -> int:
    with _stashed_canonical_cache() as cache_dir:
        misses, total = _compile_scenarios(cache_dir)
    if misses:
        print(
            f"\nSTALE: {misses}/{total} dry-run scenarios missed the committed "
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
    # Compile at the canonical cache path (the key covers the path — see
    # _CANONICAL_CACHE) but with NO committed seed visible, so the new
    # entries are exactly what the current code produces: park the committed
    # seed (the helper copy-if-missing seeds from it), stash any warm cache,
    # compile, harvest, restore both.
    with _parked_seed(_DRYRUN_SEED) as park:
        with _stashed_canonical_cache() as cache_dir:
            _compile_scenarios(cache_dir)
            new = sorted(
                f for f in os.listdir(cache_dir)
                if f.startswith("jit_train_step")
            )
            for f in new:
                shutil.copy(os.path.join(cache_dir, f),
                            os.path.join(_DRYRUN_SEED, f))
        if not new:
            print("regen: no jit_train_step entries produced — aborting, "
                  "committed seed left unchanged")
            return 1
        park.commit()
        print(f"\nregen: ci/dryrun_cache replaced with {len(new)} entries:")
        for f in new:
            sz = os.path.getsize(os.path.join(_DRYRUN_SEED, f))
            print(f"  {f} ({sz / 1e6:.1f} MB)")
        print("Verify with `python ci/cache_tools.py check` (expect FRESH), "
              "then commit ci/dryrun_cache.")
        return 0


def cmd_regen_tests() -> int:
    """Rebuild ci/test_cache: run the fast tier cold and harvest .jax_cache.

    Slow (the point is to pay the cold compiles once); run on a quiet
    machine.  Entries are whatever the tier compiles for >1 s — the same
    min-compile-time threshold conftest configures.
    """
    jax_cache = os.path.join(_REPO, ".jax_cache")
    if os.path.isdir(jax_cache):
        shutil.rmtree(jax_cache)
    with _parked_seed(_TEST_SEED) as park:
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q",
             "-m", "not slow", "-p", "no:cacheprovider"],
            cwd=_REPO,
        )
        if rc != 0:
            print(f"regen-tests: fast tier failed (rc={rc}); committed seed "
                  "left unchanged")
            return rc
        entries = sorted(
            f for f in os.listdir(jax_cache)
            if os.path.isfile(os.path.join(jax_cache, f))
        )
        if not entries:
            # A zero-entry harvest (everything compiled under the 1 s
            # persistence threshold, or the tier was mass-deselected) must
            # not destroy the good committed seed.
            print("regen-tests: fast tier produced no cache entries — "
                  "aborting, committed seed left unchanged")
            return 1
        for f in entries:
            shutil.copy(os.path.join(jax_cache, f),
                        os.path.join(_TEST_SEED, f))
        park.commit()
        print(f"regen-tests: ci/test_cache replaced with {len(entries)} "
              "entries; commit ci/test_cache.")
        return 0


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

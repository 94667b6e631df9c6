"""Filesystem behavior of ci/cache_tools.py's stash/recover primitives.

These guard the driver's dry-run budget (MULTICHIP_r03's rc=124 failure
mode): ``check`` must run against an EMPTY canonical cache dir (a warm one
masks a stale committed seed as FRESH) and must put the user's warm cache
back afterwards; ``regen`` must survive a hard kill re-runnably.  No JAX
compilation here — pure fs logic, monkeypatched onto a tmp path.
"""

import importlib.util
import os
import sys

_CT_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "ci",
                        "cache_tools.py")


def _load_cache_tools():
    spec = importlib.util.spec_from_file_location("_cache_tools_ut", _CT_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_stashed_canonical_cache_parks_and_restores(tmp_path, monkeypatch):
    ct = _load_cache_tools()
    canonical = str(tmp_path / "xmc_jax_cache")
    monkeypatch.setattr(ct, "_CANONICAL_CACHE", canonical)

    os.makedirs(canonical)
    with open(os.path.join(canonical, "warm-entry"), "w") as f:
        f.write("warm")

    with ct._stashed_canonical_cache() as cache_dir:
        assert cache_dir == canonical
        # the warm entry must NOT be visible inside the stash window
        assert not os.path.exists(os.path.join(canonical, "warm-entry"))
        os.makedirs(canonical, exist_ok=True)
        with open(os.path.join(canonical, "check-miss"), "w") as f:
            f.write("fresh")

    # after: check-time writes discarded, warm cache restored intact
    assert sorted(os.listdir(canonical)) == ["warm-entry"]
    with open(os.path.join(canonical, "warm-entry")) as f:
        assert f.read() == "warm"


def test_stashed_canonical_cache_without_existing_dir(tmp_path, monkeypatch):
    ct = _load_cache_tools()
    canonical = str(tmp_path / "xmc_jax_cache")
    monkeypatch.setattr(ct, "_CANONICAL_CACHE", canonical)

    with ct._stashed_canonical_cache():
        os.makedirs(canonical, exist_ok=True)
        with open(os.path.join(canonical, "e"), "w") as f:
            f.write("x")
    # nothing to restore; the scratch dir is removed
    assert not os.path.exists(canonical)


def test_stashed_canonical_cache_recovers_orphaned_stash(tmp_path, monkeypatch):
    """A .stash left by a hard kill holds the user's REAL warm cache (parked
    by the interrupted run); the canonical path, if present, is that run's
    scratch.  Recovery must restore the stash, never delete it — deleting it
    would destroy the warm cache and recreate the cold-compile failure mode."""
    ct = _load_cache_tools()
    canonical = str(tmp_path / "xmc_jax_cache")
    monkeypatch.setattr(ct, "_CANONICAL_CACHE", canonical)

    os.makedirs(canonical + ".stash")
    with open(canonical + ".stash/warm-entry", "w") as f:
        f.write("warm")
    os.makedirs(canonical)  # scratch from the interrupted check
    with open(os.path.join(canonical, "check-scratch"), "w") as f:
        f.write("scratch")

    with ct._stashed_canonical_cache():
        assert not os.path.exists(os.path.join(canonical, "warm-entry"))
    assert sorted(os.listdir(canonical)) == ["warm-entry"]
    with open(os.path.join(canonical, "warm-entry")) as f:
        assert f.read() == "warm"
    assert not os.path.exists(canonical + ".stash")


def test_stashed_canonical_cache_recovers_stash_without_canonical(
        tmp_path, monkeypatch):
    """Kill-before-first-write variant: stash exists, canonical absent."""
    ct = _load_cache_tools()
    canonical = str(tmp_path / "xmc_jax_cache")
    monkeypatch.setattr(ct, "_CANONICAL_CACHE", canonical)

    os.makedirs(canonical + ".stash")
    with open(canonical + ".stash/warm-entry", "w") as f:
        f.write("warm")

    with ct._stashed_canonical_cache():
        pass
    assert sorted(os.listdir(canonical)) == ["warm-entry"]
    assert not os.path.exists(canonical + ".stash")


def test_parked_seed_commit_and_abort(tmp_path):
    ct = _load_cache_tools()
    seed = str(tmp_path / "seed")

    # abort path (no commit): harvest discarded, committed seed restored
    os.makedirs(seed)
    with open(os.path.join(seed, "committed"), "w") as f:
        f.write("c")
    with ct._parked_seed(seed):
        assert os.listdir(seed) == []  # empty dir for the fresh harvest
        with open(os.path.join(seed, "harvest"), "w") as f:
            f.write("h")
    assert sorted(os.listdir(seed)) == ["committed"]

    # exception path: same restore
    try:
        with ct._parked_seed(seed):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert sorted(os.listdir(seed)) == ["committed"]

    # commit path: harvest replaces the committed seed, parked copy removed
    with ct._parked_seed(seed) as park:
        with open(os.path.join(seed, "harvest"), "w") as f:
            f.write("h")
        park.commit()
    assert sorted(os.listdir(seed)) == ["harvest"]
    assert not os.path.exists(seed + ".parked")


def test_recover_parked_restores_seed(tmp_path):
    ct = _load_cache_tools()
    seed = str(tmp_path / "dryrun_cache")
    # crash state: seed half-replaced, parked holds the last good copy
    os.makedirs(seed)
    with open(os.path.join(seed, "partial"), "w") as f:
        f.write("bad")
    os.makedirs(seed + ".parked")
    with open(seed + ".parked/good-entry", "w") as f:
        f.write("good")

    ct._recover_parked(seed)
    assert sorted(os.listdir(seed)) == ["good-entry"]
    assert not os.path.exists(seed + ".parked")


def test_recover_parked_noop_without_parked(tmp_path):
    ct = _load_cache_tools()
    seed = str(tmp_path / "dryrun_cache")
    os.makedirs(seed)
    with open(os.path.join(seed, "entry"), "w") as f:
        f.write("e")
    ct._recover_parked(seed)
    assert sorted(os.listdir(seed)) == ["entry"]

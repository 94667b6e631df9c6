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


def test_stashed_canonical_cache_clears_dead_stash(tmp_path, monkeypatch):
    """A .stash left by a hard kill must not block (or leak into) later runs."""
    ct = _load_cache_tools()
    canonical = str(tmp_path / "xmc_jax_cache")
    monkeypatch.setattr(ct, "_CANONICAL_CACHE", canonical)

    os.makedirs(canonical + ".stash")
    with open(canonical + ".stash/old", "w") as f:
        f.write("dead")
    os.makedirs(canonical)
    with open(os.path.join(canonical, "warm"), "w") as f:
        f.write("w")

    with ct._stashed_canonical_cache():
        pass
    assert sorted(os.listdir(canonical)) == ["warm"]
    assert not os.path.exists(canonical + ".stash")


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

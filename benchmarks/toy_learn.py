"""Learning-dynamics evidence: DF-GAN learns caption conditioning on the chip.

Trains the flagship DF-GAN family at 64 px on the procedural toy dataset
(``xmc_gan_tpu/data/toy.py``: colored shapes at named positions, captions
naming color/shape/position) with the full XMC loss set — hinge + RMIS +
MAGP's second Adam step + sentence InfoNCE + real-fake image InfoNCE — the
exact step ``train.make_train_step`` ships.  Every EVAL_EVERY steps it
reports, on a held-out caption set:

* ``color_acc`` / ``pos_acc`` — does the *generated* image show the color /
  position its caption names?  (analytic classifiers; chance = 0.25 / 0.5)
* ``d_margin`` — mean D logit gap between matched and mismatched (real
  image, caption) pairs: the matching-aware discriminator's conditioning.
* ``fid_proxy`` — random-init-Inception FID between generated and real toy
  images (relative tracking only; see eval.FidComputer).

This is the bug-class detector forward-parity tests cannot be (VERDICT r2
missing #2): optimizer coupling, loss scales, two-Adam MAGP schedule, SN
dynamics only show up as training curves (the reference's own validation was
empirical curves, ``/root/reference/xmc_gan/train_gan.py:292-321``).

Usage: python benchmarks/toy_learn.py [STEPS] [BS] [NCH] [GRID_PATH]
(default 2000 64 32 none).  Prints one JSON line per eval point, then a
summary verdict comparing the final third of the run against the init point.
``--gen NAME`` trains a different registered generator family (e.g.
CONCEPT_OUTATTN_GEN / CONCEPT_INATTN_GEN, whose blocks cross-attend image
queries over the word embeddings — the only families where caption words
reach G through attention rather than the sentence vector), so the same
learning-dynamics evidence covers the G-side masked-attention gradient path.
With GRID_PATH set, saves a visual artifact: row pairs of (real render of a
caption, generated image for that caption) for 16 held-out captions.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/xmc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from xmc_gan_tpu.config import cfg_from_dict
from xmc_gan_tpu.data import toy
from xmc_gan_tpu.train import create_train_state, make_models, make_train_step

EVAL_N = 256  # held-out captions per eval point
EMB_DIM = 256


def build_cfg(nch: int, bs: int, word: bool = False, gen: str = "DF_GEN",
              disc: str = "DF_DISC", img_match: bool | None = None):
    # reference hyperparameters (cfg/df_gan_damsm.yml): G lr 1e-4 / D 4e-4,
    # betas (0, 0.9), MAGP + RMIS + SENT + DISC, B_GLOBAL soft labels.
    # word=True additionally turns on XMC's word-region attentional loss
    # (the north-star objective) over the D's 16x16 region head.
    # disc=CONCEPT_NETD defaults to the projection mode its reference config
    # selects (cfg/concept_out_df_gan.yml:36-37: SENT_MATCH, not IMG_MATCH);
    # img_match=True overrides to the IMG_MATCH head (a framework extension
    # for CONCEPT_NETD — the plateau ablation, BASELINE.md).
    if disc == "CONCEPT_NETD":
        im = bool(img_match)
        disc_cfg = {"ENCODER_NAME": disc, "SPEC_NORM": True,
                    "SENT_MATCH": not im, "IMG_MATCH": im}
    else:
        disc_cfg = {"ENCODER_NAME": disc, "SPEC_NORM": True, "IMG_MATCH": True}
    return cfg_from_dict({
        "CONFIG_NAME": "TOY_LEARN",
        "TRAIN": {
            "NCH": nch, "NEF": 256, "NOISE_DIM": 100, "HE_INIT": True,
            "RMIS_LOSS": True, "MAGP": True, "N_CRITIC": 1, "BATCH_SIZE": bs,
            "ENCODER_LOSS": {"SENT": True, "DISC": True, "WORD": word,
                             "B_GLOBAL": True},
            "SMOOTH": {"GLOBAL": 0.0, "WORD": 1.0},
        },
        "IMG": {"SIZE": 64},
        "TEXT": {"EMBEDDING_DIM": EMB_DIM, "MAX_LENGTH": 8},
        "GEN": {"ENCODER_NAME": gen},
        "DISC": disc_cfg,
    })


def sigma_probe(d_params, d_spectral) -> tuple[float, float]:
    """How converged is the power-iteration sigma estimate?  Returns
    (max, mean) relative error of ``u^T W v`` vs the exact top singular value
    over every spectral-normalized kernel — the direct measurement behind the
    1-vs-5 refresh-cadence claim (reference refreshes once per D forward,
    ``/root/reference/xmc_gan/model/modules.py:13-33``; this framework once
    per step by default, ``train.refresh_spectral``)."""
    import flax

    from xmc_gan_tpu.train import matricize_spectral_kernel

    errs: list[float] = []

    def walk(spec_node, param_node):
        if isinstance(spec_node, dict) and set(spec_node) >= {"u", "v"} \
                and "kernel" in param_node:
            k = np.asarray(param_node["kernel"], np.float32)
            u = np.asarray(spec_node["u"], np.float32)
            v = np.asarray(spec_node["v"], np.float32)
            # same matricization the train step uses — shared helper, so the
            # probe cannot drift from refresh_spectral's layout rules
            w = np.asarray(matricize_spectral_kernel(k, u.shape[0]),
                           np.float32)
            sig_pi = float(u @ (w @ v))
            sig_true = float(np.linalg.svd(w, compute_uv=False)[0])
            errs.append(abs(sig_pi - sig_true) / max(sig_true, 1e-12))
            return
        for kk, vv in spec_node.items():
            if isinstance(vv, dict):
                walk(vv, param_node[kk])

    walk(flax.core.unfreeze(d_spectral), flax.core.unfreeze(d_params))
    return (max(errs), float(np.mean(errs))) if errs else (0.0, 0.0)


def make_batch(rng: np.random.RandomState, bs: int) -> dict:
    attrs = toy.sample_attrs(rng, bs)
    caps, _ = toy.make_captions(attrs)
    words, sent, mask = toy.encode_captions(caps, EMB_DIM)
    return {
        "imgs": jnp.asarray(toy.render(attrs)),
        "sent_embs": jnp.asarray(sent),
        "words_embs": jnp.asarray(words),
        "mask": jnp.asarray(mask),
    }, attrs


def main() -> None:
    use_word = "--word" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if a != "--word"]
    gen = "DF_GEN"
    if "--gen" in args:
        gi = args.index("--gen")
        gen = args[gi + 1]
        del args[gi:gi + 2]
    disc = "DF_DISC"
    if "--disc" in args:
        di = args.index("--disc")
        disc = args[di + 1]
        del args[di:di + 2]
    img_match = None
    if "--img_match" in args:
        img_match = True
        args.remove("--img_match")
    spectral_iters = 1
    if "--spectral_iters" in args:
        si = args.index("--spectral_iters")
        spectral_iters = int(args[si + 1])
        del args[si:si + 2]
    if "--platform" in args:
        pi = args.index("--platform")
        # config-level, not env: the container sitecustomize pins
        # jax_platforms after reading JAX_PLATFORMS (see cli.py main)
        jax.config.update("jax_platforms", args[pi + 1])
        del args[pi:pi + 2]
    steps = int(args[0]) if len(args) > 0 else 2000
    bs = int(args[1]) if len(args) > 1 else 64
    nch = int(args[2]) if len(args) > 2 else 32
    eval_every = max(steps // 10, 1)

    cfg = build_cfg(nch, bs, use_word, gen, disc, img_match)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g_model, d_model = make_models(cfg, dtype)
    state = create_train_state(cfg, jax.random.PRNGKey(100))
    step = jax.jit(
        make_train_step(cfg, g_model, d_model, dtype=dtype,
                        spectral_iters=spectral_iters),
        donate_argnums=(0,),
    )

    @jax.jit
    def sample(g_params, noise, sent, words, mask):
        # words/mask are ignored by DF_GEN and consumed by the attention
        # families — one signature covers every registered generator
        return g_model.apply({"params": g_params}, noise, sent, words, mask)

    @jax.jit
    def d_logit(g_params, d_params, spectral, imgs, sent):
        psent = g_model.apply({"params": g_params}, sent, method="project_sent")
        variables = {"params": d_params}
        if spectral:
            variables["spectral"] = spectral
        feats = d_model.apply(variables, imgs.astype(dtype))
        match, _, _ = d_model.apply(variables, feats, psent, method="logits")
        return match.astype(jnp.float32).mean()

    # fixed held-out eval set (fresh captions, never trained in this order)
    erng = np.random.RandomState(9)
    eval_attrs = toy.sample_attrs(erng, EVAL_N)
    ecaps, _ = toy.make_captions(eval_attrs)
    ewords, esent, emask = toy.encode_captions(ecaps, EMB_DIM)
    ewords, esent, emask = map(jnp.asarray, (ewords, esent, emask))
    ereal = jnp.asarray(toy.render(eval_attrs))
    enoise = jax.random.normal(jax.random.PRNGKey(5), (EVAL_N, cfg.TRAIN.NOISE_DIM))

    from xmc_gan_tpu.eval import FidComputer

    fid = FidComputer(batch_size=EVAL_N)
    real_stats = fid.stats()
    fid.update(real_stats, ereal)

    def evaluate(state):
        fake = np.asarray(
            sample(state.g_params, enoise, esent, ewords, emask), np.float32
        )
        color = toy.classify_color(fake)
        pos = toy.classify_position(fake)
        matched = d_logit(
            state.g_params, state.d_params, state.d_spectral, ereal, esent
        )
        mismatched = d_logit(
            state.g_params, state.d_params, state.d_spectral, ereal,
            jnp.roll(esent, 1, axis=0),
        )
        fake_stats = fid.stats()
        fid.update(fake_stats, jnp.asarray(fake))
        sig_max, sig_mean = sigma_probe(state.d_params, state.d_spectral)
        return {
            "color_acc": float((color == eval_attrs[:, 0]).mean()),
            "pos_acc": float((pos == eval_attrs[:, 2]).mean()),
            "d_margin": float(matched) - float(mismatched),
            "fid_proxy": float(fid.fid(real_stats, fake_stats)),
            "sigma_err_max": sig_max,
            "sigma_err_mean": sig_mean,
        }

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    history = []

    def report(step_i, extra=None):
        m = evaluate(state)
        m["step"] = step_i
        if extra:
            m.update(extra)
        history.append(m)
        print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                          for k, v in m.items()}), flush=True)

    report(0)
    t0 = time.perf_counter()
    for i in range(1, steps + 1):
        batch, _ = make_batch(rng, bs)
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        if i % eval_every == 0:
            losses = {
                "Loss_D": float(metrics["Loss_D"]),
                "Loss_G": float(metrics["Loss_G"]),
                "d_loss_gp": float(metrics["d_loss_gp"]),
            }
            if use_word:
                losses["ds_word"] = float(metrics["ds_word"])
                losses["gs_word"] = float(metrics["gs_word"])
            assert all(np.isfinite(v) for v in losses.values()), losses
            report(i, losses)
    dt = time.perf_counter() - t0

    init, tail = history[0], history[-(len(history) // 3 + 1):]
    final = {k: float(np.mean([h[k] for h in tail]))
             for k in ("color_acc", "pos_acc", "d_margin", "fid_proxy",
                       "sigma_err_max", "sigma_err_mean")}
    grid_path = args[3] if len(args) > 3 else None
    if grid_path:
        from xmc_gan_tpu.utils.miscc import save_image_grid

        n_show = 16
        fake = np.asarray(
            sample(state.g_params, enoise[:n_show], esent[:n_show],
                   ewords[:n_show], emask[:n_show]),
            np.float32,
        )
        real = np.asarray(ereal[:n_show], np.float32)
        # alternate real / generated per caption: columns pair up in the grid
        inter = np.stack([real, fake], axis=1).reshape(-1, *real.shape[1:])
        save_image_grid(inter, grid_path, nrow=8)
        print(f"saved caption-conditioning grid (real|generated pairs) to "
              f"{grid_path}", flush=True)

    verdict = {
        "steps": steps, "bs": bs, "nch": nch, "gen": gen, "disc": disc,
        # effective head config, not the CLI flag: DF_DISC always trains
        # with the IMG_MATCH head (build_cfg), --img_match only toggles it
        # for CONCEPT_NETD
        "img_match": bool(cfg.DISC.IMG_MATCH),
        "spectral_iters": spectral_iters,
        "sigma_err_max_final": round(final["sigma_err_max"], 5),
        "sigma_err_mean_final": round(final["sigma_err_mean"], 5),
        "train_seconds": round(dt, 1),
        "img_per_sec": round(steps * bs / dt, 1),
        "color_acc_init": round(init["color_acc"], 3),
        "color_acc_final": round(final["color_acc"], 3),
        "pos_acc_init": round(init["pos_acc"], 3),
        "pos_acc_final": round(final["pos_acc"], 3),
        "d_margin_init": round(init["d_margin"], 3),
        "d_margin_final": round(final["d_margin"], 3),
        "fid_proxy_init": round(init["fid_proxy"], 2),
        "fid_proxy_final": round(final["fid_proxy"], 2),
        "learns_conditioning": bool(
            final["color_acc"] > init["color_acc"] + 0.15
            and final["d_margin"] > init["d_margin"]
        ),
        "fid_proxy_drops": bool(final["fid_proxy"] < init["fid_proxy"] * 0.8),
    }
    if use_word:
        with_word = [h for h in history if "gs_word" in h]
        first_w, tail_w = with_word[0], with_word[-(len(with_word) // 3 + 1):]
        verdict["word_loss"] = True
        verdict["gs_word_first"] = round(first_w["gs_word"], 3)
        verdict["gs_word_final"] = round(
            float(np.mean([h["gs_word"] for h in tail_w])), 3)
        verdict["ds_word_first"] = round(first_w["ds_word"], 3)
        verdict["ds_word_final"] = round(
            float(np.mean([h["ds_word"] for h in tail_w])), 3)
        # the word objective trains: G's word-region matching improves from
        # its first reported value
        verdict["word_loss_improves"] = bool(
            verdict["gs_word_final"] < verdict["gs_word_first"]
        )
    print("VERDICT " + json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()

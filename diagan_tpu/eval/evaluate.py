"""Checkpoint evaluation drivers — the reference's evaluate_* surface.

Parity with reference diagan-pkg/diagan/trainer/evaluate.py:97-1700: resolve
`checkpoints/netG/netG_{step}_steps.pth` (+ netD_drs, or netD with
use_original_netD — evaluate.py:190-244), optionally wrap G in DRS, loop
over seeds, and write metric JSONs incrementally under
`{log_dir}/evaluate/step-{step}/{metric}_{nr}k_{nf}k.json`
(evaluate.py:143-183,299-301).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.eval import metrics as M
from diagan_tpu.eval.drs import DRS
from diagan_tpu.eval.inception import InceptionFeaturizer
from diagan_tpu.train import checkpoint as ckpt
from diagan_tpu.train.state import create_net_state
from diagan_tpu.train.trainer import _make_tx


def _init_states(bundle, seed=0):
    tx = _make_tx(2e-4, (0.0, 0.9), None, None)
    k = jax.random.key(seed)
    z0 = jnp.zeros((2, bundle.nz))
    if bundle.dataset == "25gaussian":
        x0 = jnp.zeros((2, 2))
    else:
        x0 = jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.nc))
    g = create_net_state(bundle.gen, {"params": k}, (z0,), tx, train=True)
    d = create_net_state(bundle.disc, {"params": k, "dropout": k}, (x0,), tx)
    d_drs = (
        create_net_state(bundle.disc_drs, {"params": k, "dropout": k}, (x0,), tx)
        if bundle.disc_drs is not None else None
    )
    return g, d, d_drs


def make_gen_fn(bundle, g_state):
    """Jitted eval-mode z -> images closure."""
    noise_key = jax.random.key(0)  # StyleGAN2 per-layer noise injection

    @jax.jit
    def gen_fn(z):
        return bundle.gen.apply(
            {"params": g_state.params, **g_state.state}, z, train=False,
            rngs={"noise": noise_key},
        )

    return gen_fn


def make_disc_fn(disc, d_state):
    key = jax.random.key(0)

    @jax.jit
    def disc_fn(x):
        out = disc.apply(
            {"params": d_state.params, **d_state.state}, x,
            update_stats=False, train=False, rngs={"dropout": key},
        )
        return out[0] if isinstance(out, tuple) else out

    return disc_fn


class Sampler:
    """Plain batched G sampler (the non-DRS path).

    Same dispatch-grain design as eval.drs.DRS: K batches per scanned
    dispatch (auto ~256MB of proposals), optional on-device quantization
    so uint8 — not float32 — crosses the ~40MB/s device->host link."""

    def __init__(self, gen_fn, nz, key=None, batch_size=256, chunk=None):
        self.gen_fn = gen_fn
        self.nz = nz
        self.batch_size = batch_size
        self.key = key if key is not None else jax.random.key(0)
        if chunk is None:
            img = jax.eval_shape(
                gen_fn, jax.ShapeDtypeStruct((batch_size, nz), np.float32)
            )
            batch_bytes = int(np.prod(img.shape)) * img.dtype.itemsize
            chunk = int(np.clip(256 * 2**20 // max(batch_bytes, 1), 1, 128))
        self.chunk = chunk

        @jax.jit
        def sample_chunk(key):
            def body(_, k):
                z = jax.random.normal(k, (batch_size, nz))
                return None, self.gen_fn(z)

            _, imgs = jax.lax.scan(body, None,
                                   jax.random.split(key, self.chunk))
            return imgs.reshape((-1,) + imgs.shape[2:])

        self._sample_chunk = sample_chunk
        self._to_uint8 = jax.jit(
            lambda x: jnp.clip((x + 1) * 127.5, 0, 255).astype(jnp.uint8)
        )
        from diagan_tpu.eval.drs import minmax_uint8

        self._to_minmax_uint8 = jax.jit(minmax_uint8)

    def generate_images(self, num_images, return_uint8=False,
                        minmax_uint8=False):
        out = []
        n = 0
        while n < num_images:
            self.key, sub = jax.random.split(self.key)
            imgs = self._sample_chunk(sub)
            if minmax_uint8:
                imgs = self._to_minmax_uint8(imgs)
            elif return_uint8:
                imgs = self._to_uint8(imgs)
            out.append(np.asarray(imgs))
            n += len(out[-1])
        return np.concatenate(out)[:num_images]


def load_eval_models(bundle, log_dir, evaluate_step, use_drs=False,
                     use_original_netD=False, netD_ckpt_dir=None):
    """Restore G (and the DRS discriminator) at a step. Returns
    (g_state, d_drs_state_or_None)."""
    log_dir = Path(log_dir)
    if bundle.model == "stylegan":
        return _load_stylegan2_eval_models(bundle, log_dir, evaluate_step,
                                           use_drs)
    g_state, d_state, d_drs_state = _init_states(bundle)
    g_path = log_dir / "checkpoints" / "netG" / f"netG_{evaluate_step}_steps.pth"
    assert g_path.is_file(), f"missing {g_path}"
    g_state = ckpt.restore_net(g_state, g_path, params_only=True)
    if not use_drs:
        return g_state, None
    # --use_original_netD evaluates a phase-1 model's own D under DRS
    # (reference eval_gan_drs.py:28, evaluate.py:190-196)
    name = "netD" if use_original_netD else "netD_drs"
    d_dir = Path(netD_ckpt_dir) if netD_ckpt_dir else log_dir / "checkpoints"
    d_path = d_dir / name / f"{name}_{evaluate_step}_steps.pth"
    assert d_path.is_file(), f"missing {d_path}"
    d_drs_state = ckpt.restore_net(d_drs_state or d_state, d_path,
                                   params_only=True)
    return g_state, d_drs_state


def read_stylegan2_ckpt(path, gen, disc=None, use_drs=False):
    """Standalone reader for the monolithic StyleGAN2 dict {iter:06d}.pt
    (both the native msgpack layout and a reference torch zip): returns
    {'g_ema': params[, 'drs_d': params]} with no trainer construction, no
    optimizer build, and no filesystem writes. Sampling uses g_ema and DRS
    uses drs_d falling back to d — parity with reference evaluate.py:240-244
    / eval_gan_drs.py:91-108 / train_ffhq_phase2.py:605-610."""
    import jax as _jax
    from flax import serialization

    path = Path(path)
    k = _jax.random.key(0)
    z0 = jnp.zeros((2, gen.style_dim))
    g_tmpl = _jax.device_get(
        gen.init({"params": k, "noise": k}, z0)["params"]
    )
    d_tmpl = None
    if use_drs:
        assert disc is not None, "use_drs needs the discriminator module"
        x0 = jnp.zeros((2, gen.size, gen.size, 3))
        d_tmpl = _jax.device_get(disc.init({"params": k}, x0)["params"])

    with open(path, "rb") as f:
        data = f.read()
    if data[:4] == b"PK\x03\x04":  # reference torch checkpoint
        from diagan_tpu.utils import torch_import as ti

        conv = ti.import_stylegan2_checkpoint(path, gen.size)
        raw = {"g_ema": conv.get("g_ema", conv.get("g")),
               "d": conv.get("d"), "drs_d": conv.get("drs_d")}
        raw = {kk: v for kk, v in raw.items() if v is not None}
    else:
        raw = serialization.msgpack_restore(bytearray(data))
    out = {
        "g_ema": serialization.from_state_dict(
            g_tmpl, raw.get("g_ema", raw.get("g")))
    }
    if use_drs:
        out["drs_d"] = serialization.from_state_dict(
            d_tmpl, raw.get("drs_d", raw["d"]))
    return {kk: _jax.tree.map(jnp.asarray, v) for kk, v in out.items()}


def _load_stylegan2_eval_models(bundle, log_dir, evaluate_step, use_drs):
    from diagan_tpu.train.state import NetState

    path = Path(log_dir) / "checkpoint" / f"{evaluate_step:06d}.pt"
    assert path.is_file(), f"missing {path}"
    loaded = read_stylegan2_ckpt(
        path, bundle.gen, disc=bundle.disc_drs if use_drs else None,
        use_drs=use_drs,
    )
    g_state = NetState(loaded["g_ema"], {}, None, jnp.asarray(evaluate_step))
    d_drs_state = (
        NetState(loaded["drs_d"], {}, None, jnp.asarray(evaluate_step))
        if use_drs else None
    )
    return g_state, d_drs_state


def evaluate_checkpoint(
    metric,
    bundle,
    log_dir,
    evaluate_step,
    real_images=None,
    stats_file=None,
    num_real_samples=50000,
    num_fake_samples=50000,
    num_runs=1,
    start_seed=0,
    use_drs=False,
    use_original_netD=False,
    featurizer=None,
    batch_size=256,
    real_subset_index=None,
    name=None,
    overwrite=False,
    cache_fakes=True,
):
    """Compute `metric` ('fid' | 'inception_score' | 'kid' | 'pr') for one
    checkpoint step across seeds; write/extend the reference-layout JSON.

    cache_fakes: persist each seed's generated uint8 set to
    images/fid_gen_images_{n}k_{seed}[_drs].npy and reuse it across
    metric invocations (reference fid_score.py:131-171 — its cache lives
    at the experiment root, so steps and DRS/non-DRS collide; here the
    cache is scoped to the step directory and tagged _drs, a documented
    correctness deviation). fid+is+pr over one checkpoint then generate
    the 50k fakes once."""
    log_dir = Path(log_dir)
    g_state, d_drs_state = load_eval_models(
        bundle, log_dir, evaluate_step, use_drs, use_original_netD
    )
    gen_fn = make_gen_fn(bundle, g_state)
    featurizer = featurizer or InceptionFeaturizer()

    out_dir = log_dir / "evaluate" / f"step-{evaluate_step}"
    out_dir.mkdir(parents=True, exist_ok=True)
    nr = num_real_samples // 1000
    nf = num_fake_samples // 1000
    suffix = {"fid": f"_{nr}k_{nf}k", "kid": f"_{nr}k_{nf}k",
              "inception_score": f"_{nf}k", "pr": f"_{nr}k_{nf}k"}[metric]
    stem = f"{metric}_{name}" if name else metric
    out_file = out_dir / f"{stem}{suffix}.json"
    results = (
        json.loads(out_file.read_text()) if out_file.is_file() and not overwrite
        else {"metric": metric, "scores": {}}
    )
    results["inception_weights"] = featurizer.weights_kind
    results["use_drs"] = use_drs

    # real-side features once (shared across seeds). For plain FID the
    # (mu, sigma) pair is cached in the reference's statistics layout
    # (fid_score.py:43-74: metrics/fid/statistics/fid_stats_{...}.npz).
    real_feats = None
    if metric == "fid" and stats_file is None and real_subset_index is None:
        cache = (
            log_dir / "metrics" / "fid" / "statistics"
            / f"fid_stats_{bundle.dataset}_{nr}k_run_{start_seed}.npz"
        )
        if cache.is_file():
            stats_file = cache
        elif real_images is not None:
            sel = real_images
            if len(sel) > num_real_samples:
                rng = np.random.default_rng(start_seed)
                sel = sel[rng.choice(len(sel), num_real_samples, replace=False)]
            mu, sigma = M.activation_statistics(featurizer.features(sel))
            M.save_stats(cache, mu, sigma)
            stats_file = cache
    if metric in ("fid", "kid", "pr") and stats_file is None:
        assert real_images is not None, "need real_images or stats_file"
        sel = real_images
        if real_subset_index is not None:
            sel = real_images[np.asarray(real_subset_index)]
        if len(sel) > num_real_samples:
            rng = np.random.default_rng(start_seed)
            sel = sel[rng.choice(len(sel), num_real_samples, replace=False)]
        real_feats = featurizer.features(sel)

    for run in range(num_runs):
        seed = start_seed + run
        if str(seed) in results["scores"] and not overwrite:
            continue
        key = jax.random.key(seed)
        fake_cache = (
            out_dir / "images"
            / f"fid_gen_images_{nf}k_{seed}{'_drs' if use_drs else ''}.npy"
        )
        if cache_fakes and fake_cache.is_file():
            fakes_u8 = np.load(fake_cache)
        else:
            if use_drs:
                disc_fn = make_disc_fn(
                    bundle.disc_drs or bundle.disc, d_drs_state
                )
                sampler = DRS(gen_fn, disc_fn, bundle.nz, key=key,
                              batch_size=batch_size)
            else:
                sampler = Sampler(gen_fn, bundle.nz, key=key,
                                  batch_size=batch_size)
            # reference fid_score.py:77-101 normalization, applied on device
            # before the (slow) device->host transfer — uint8 crosses the
            # link
            fakes_u8 = sampler.generate_images(num_fake_samples,
                                               minmax_uint8=True)
            if cache_fakes:
                fake_cache.parent.mkdir(parents=True, exist_ok=True)
                np.save(fake_cache, fakes_u8)
        feats, logits = featurizer.features_and_logits(fakes_u8)

        if metric == "fid":
            score = M.fid_from_features(real_feats, feats, stats_file=stats_file)
        elif metric == "kid":
            score = M.kid_from_features(real_feats, feats)[0]
        elif metric == "inception_score":
            score = M.inception_score_from_logits(logits)[0]
        elif metric == "pr":
            score = M.compute_pr(real_feats, feats, nearest_k=3)
        else:
            raise ValueError(metric)
        results["scores"][str(seed)] = score
        out_file.write_text(json.dumps(results, indent=2))
        print(f"INFO: {metric} (step {evaluate_step}, seed {seed}) = {score}")

    return results

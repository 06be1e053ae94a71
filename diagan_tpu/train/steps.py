"""Fused jitted GAN train steps.

This replaces the reference's per-step torch loop
(`LogTrainer.train()` hot loop, reference
diagan-pkg/diagan/trainer/trainer.py:238-291): n_dis discriminator updates,
the lock-step DRS discriminator updates on unweighted data
(trainer.py:266-277), and one generator update on the last inner iteration
(trainer.py:283-291) — all inside ONE jitted function with zero host
synchronization. Batches are drawn on device (weighted categorical for the
phase-2 resampler, uniform for D_drs), so the whole step graph — sampling,
gather, dequantize, G/D forwards, losses, Adam updates — compiles to a
single XLA program. A further `make_train_chunk` wraps K steps in a
lax.scan so host round-trips happen once per K steps.

Loss-level switches implemented here (vs. the reference's mixin classes):
  - GOLD: fake-term reweighting by stop_grad(logit) activated when
    step >= gold_step (gold_reweight_models.py:10-61, trainer.py:215-216).
  - top-k: G trains on the top-k fake logits with rate
    max(0.99^epoch, 0.5) (topk_models.py:15-38).
  - SSGAN: 4-way rotation self-supervision (D on real @1.0, G on fake @0.2).
  - InfoMaxGAN: local-global InfoNCE (both @0.2).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from diagan_tpu.data.sampler import sample_uniform_indices, sample_weighted_indices
from diagan_tpu.models import losses as L
from diagan_tpu.train.state import NetState


class StepConfig(NamedTuple):
    n_dis: int
    batch_size: int
    nz: int
    loss_type: str
    drs_loss_type: str
    model: str          # 'sngan' | 'ssgan' | 'infomax_gan' | 'dcgan' | 'toy'
    gold: bool
    gold_step: int
    topk: bool
    epoch_steps: int    # dataset batches per epoch, for top-k decay
    use_drs: bool
    quantized: bool     # uint8 image gather needs dequantize
    axis_name: str | None = None  # data-parallel mesh axis (shard_map)
    # Step-fusion probe knobs. Measured on TPU v5e (SNGAN-32, bs 64,
    # n_dis 5): concat_d is throughput-neutral (50.2 vs 50.4 steps/s) and
    # fuse_g is ~8% SLOWER (46.3) — XLA already overlaps the small
    # stop-grad G forwards with D work inside the scanned step, and the
    # 5x-batch forward serializes that stretch. Defaults keep the
    # reference's per-iteration semantics (two SN power iterations per
    # d_step, per-64-batch G BatchNorm stats).
    concat_d: bool = False  # fuse D(real)/D(fake) into one pass when safe
    fuse_g: bool = False    # batch the n_dis stop-grad G forwards into one
    # FusedProp-style shared last iteration: the G update reuses the final
    # D update's fake batch and sees the PRE-update D params (simultaneous
    # update semantics — an algorithmic deviation from the reference's
    # sequential D-then-G, so opt-in). Saves one G forward and one D
    # forward per step; XLA CSE merges the duplicated fake-branch forward.
    # Measured on TPU v5e (SNGAN-32 CIFAR-10, n_dis 5, batch 64):
    # 50.4 -> 55.0 steps/s (+9.1%). CLI: --simultaneous_g.
    simultaneous_g: bool = False


def _gather(images, idx, quantized):
    batch = jnp.take(images, idx, axis=0)
    if quantized:
        batch = batch.astype(jnp.float32) / 127.5 - 1.0
    return batch


def _sample_idx(key, num_data, log_weights, shape):
    if log_weights is None:
        return sample_uniform_indices(key, num_data, shape)
    return sample_weighted_indices(key, log_weights, shape)


def make_apply_fns(gen, disc, disc_drs):
    """Uniform apply helpers over (params, mutable-collections state)."""

    def gen_fwd(params, state, z, rng, mutable):
        variables = {"params": params, **state}
        if state:
            out, new_state = gen.apply(
                variables, z, train=True, mutable=list(state.keys()),
                rngs={"dropout": rng},
            )
        else:
            out, new_state = gen.apply(variables, z, train=True,
                                       rngs={"dropout": rng}), {}
        # mutable=False: discard collection updates (fake generation inside a
        # D step does not advance G's BatchNorm running stats; the G step does)
        return out, (new_state if mutable else state)

    def gen_eval(params, state, z):
        return gen.apply({"params": params, **state}, z, train=False)

    def make_d_fwd(dmod):
        def d_fwd(params, state, x, rng, update_stats, train=True):
            out, new_state = dmod.apply(
                {"params": params, **state}, x,
                update_stats=update_stats, train=train,
                mutable=list(state.keys()) if state else [],
                rngs={"dropout": rng},
            )
            return out, new_state
        return d_fwd

    return gen_fwd, gen_eval, make_d_fwd(disc), (
        make_d_fwd(disc_drs) if disc_drs is not None else None
    )


def _d_loss(cfg: StepConfig, loss_type, logits_real, logits_fake, gold_active):
    """Discriminator adversarial loss with optional GOLD fake-term weights."""
    if loss_type == "hinge":
        real_term = jnp.mean(L.nn_relu(1.0 - logits_real))
        fake_per = L.nn_relu(1.0 + logits_fake)
    elif loss_type in ("ns", "minimax"):
        real_term = jnp.mean(L._bce_with_logits(logits_real, 1.0))
        fake_per = L._bce_with_logits(logits_fake, 0.0)
    elif loss_type == "wasserstein":
        real_term = -jnp.mean(logits_real)
        fake_per = logits_fake
    else:
        raise ValueError(loss_type)
    if cfg.gold:
        # gold weight = stop_grad(logit**1); inactive -> 1
        w = jnp.where(gold_active, jax.lax.stop_gradient(logits_fake), 1.0)
    else:
        w = 1.0
    return real_term + jnp.mean(w * fake_per)


def make_fused_step(gen, disc, disc_drs, tx_g, tx_d, tx_d_drs, cfg: StepConfig,
                    num_data: int, drs_num_data: int, g_aux_loss=None):
    """g_aux_loss: optional hook (params, gen_fwd, key, aux, metrics) -> extra
    generator loss term, given the auxiliary pytree threaded through
    fused_step (used by Inclusive GAN's reconstruction/interp losses).

    Optional MXU-utilization fusions (cfg.fuse_g / cfg.concat_d, both
    off by default per the TPU v5e measurements in StepConfig):
      - fuse_g: all n_dis (x2 with DRS) stop-gradient generator forwards
        use the same G params, so they can run as ONE batched forward of
        n_dis*B latents (G BatchNorm stats then span the fused batch).
      - concat_d: D(real) and D(fake) run as one concatenated pass for
        discriminators with no batch-coupled layers (SNGAN/SSGAN/InfoMax/
        Toy: spectral norm only). DCGAN (BatchNorm + PacGAN packing)
        always keeps the two-pass form. The concat pass does one power
        iteration per d_step instead of two.
    """
    gen_fwd, gen_eval, d_fwd, d_drs_fwd = make_apply_fns(gen, disc, disc_drs)
    concat_d = cfg.concat_d and cfg.model in ("sngan", "ssgan", "infomax_gan",
                                              "toy")

    def d_step(d_state: NetState, tx, fwd, loss_type, real, fakes, rng,
               gold_active):
        nb = real.shape[0]

        def loss_fn(params):
            if concat_d:
                both = jnp.concatenate([real, fakes], axis=0)
                (l_both, aux_b), st2 = fwd(params, d_state.state, both, rng, True)
                lr_, lf_ = l_both[:nb], l_both[nb:]
                aux_r = jax.tree.map(lambda a: a[:nb], aux_b)
            else:
                (lr_, aux_r), st1 = fwd(params, d_state.state, real, rng, True)
                (lf_, _), st2 = fwd(params, st1, fakes, rng, True)
            loss = _d_loss(cfg, loss_type, lr_, lf_, gold_active)
            if cfg.model == "ssgan":
                rot, labels = L.rotate_batch_4way(real)
                (_, aux_rot), st2 = fwd(params, st2, rot, rng, False)
                loss = loss + 1.0 * L.ss_rotation_loss(aux_rot["ss_logits"], labels)
            elif cfg.model == "infomax_gan":
                loss = loss + 0.2 * L.infonce_loss(
                    aux_r["local_proj"], aux_r["global_proj"]
                )
            return loss, (st2, lr_, lf_)

        (loss, (new_state, lr_, lf_)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(d_state.params)
        if cfg.axis_name:
            # data-parallel gradient reduction over ICI (the NCCL-allreduce
            # equivalent; reference stylegan2/distributed.py + DDP)
            grads = jax.lax.pmean(grads, cfg.axis_name)
        updates, new_opt = tx.update(grads, d_state.opt_state, d_state.params)
        new_params = optax.apply_updates(d_state.params, updates)
        return (
            NetState(new_params, new_state, new_opt, d_state.step + 1),
            {"errD": loss, "D(x)": jnp.mean(lr_), "D(G(z))": jnp.mean(lf_)},
        )

    def g_step(g_state: NetState, d_state: NetState, z, rng, topk_rate, aux):
        def loss_fn(params):
            aux_metrics = {}
            fakes, new_g_state = gen_fwd(params, g_state.state, z, rng, mutable=True)
            (lf_, aux_f), new_d_state = d_fwd(
                d_state.params, d_state.state, fakes, rng, True
            )
            if cfg.topk:
                sorted_logits, mask = L.topk_filter(lf_, topk_rate)
                loss = L.masked_gen_loss(cfg.loss_type, sorted_logits, mask)
            else:
                loss = L.GEN_LOSSES[cfg.loss_type](lf_)
            if cfg.model == "ssgan":
                rot, labels = L.rotate_batch_4way(fakes)
                (_, aux_rot), new_d_state = d_fwd(
                    d_state.params, new_d_state, rot, rng, False
                )
                loss = loss + 0.2 * L.ss_rotation_loss(aux_rot["ss_logits"], labels)
            elif cfg.model == "infomax_gan":
                loss = loss + 0.2 * L.infonce_loss(
                    aux_f["local_proj"], aux_f["global_proj"]
                )
            if g_aux_loss is not None:
                loss = loss + g_aux_loss(params, gen_fwd, rng, aux, aux_metrics)
            return loss, (new_g_state, new_d_state, aux_metrics)

        (loss, (new_g_collections, new_d_state, aux_metrics)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(g_state.params)
        if cfg.axis_name:
            grads = jax.lax.pmean(grads, cfg.axis_name)
        updates, new_opt = tx_g.update(grads, g_state.opt_state, g_state.params)
        new_params = optax.apply_updates(g_state.params, updates)
        new_g = NetState(new_params, new_g_collections, new_opt, g_state.step + 1)
        new_d = NetState(d_state.params, new_d_state, d_state.opt_state, d_state.step)
        return new_g, new_d, {"errG": loss, **aux_metrics}

    def gd_step(g_state: NetState, d_state: NetState, real, z, rng,
                gold_active, topk_rate):
        """Shared last iteration (cfg.simultaneous_g): one G forward feeds
        both the D update (stop-grad) and the G update (pre-update D
        params). The duplicated D fake-branch forward has bit-identical
        primal graphs, so XLA CSE emits it once."""

        def loss_fn(both_params):
            d_params, g_params = both_params
            fakes, new_g_collections = gen_fwd(
                g_params, g_state.state, z, rng, mutable=True
            )
            (lr_, aux_r), st1 = d_fwd(d_params, d_state.state, real, rng, True)
            (lf_d, _), st2 = d_fwd(
                d_params, st1, jax.lax.stop_gradient(fakes), rng, True
            )
            loss_d = _d_loss(cfg, cfg.loss_type, lr_, lf_d, gold_active)
            d_params_sg = jax.tree.map(jax.lax.stop_gradient, d_params)
            (lf_g, aux_f), _ = d_fwd(d_params_sg, st1, fakes, rng, True)
            if cfg.topk:
                sorted_logits, mask = L.topk_filter(lf_g, topk_rate)
                loss_g = L.masked_gen_loss(cfg.loss_type, sorted_logits, mask)
            else:
                loss_g = L.GEN_LOSSES[cfg.loss_type](lf_g)
            if cfg.model == "ssgan":
                rot_r, labels_r = L.rotate_batch_4way(real)
                (_, aux_rot_r), st2 = d_fwd(d_params, st2, rot_r, rng, False)
                loss_d = loss_d + 1.0 * L.ss_rotation_loss(
                    aux_rot_r["ss_logits"], labels_r
                )
                rot_f, labels_f = L.rotate_batch_4way(fakes)
                (_, aux_rot_f), _ = d_fwd(d_params_sg, st2, rot_f, rng, False)
                loss_g = loss_g + 0.2 * L.ss_rotation_loss(
                    aux_rot_f["ss_logits"], labels_f
                )
            elif cfg.model == "infomax_gan":
                loss_d = loss_d + 0.2 * L.infonce_loss(
                    aux_r["local_proj"], aux_r["global_proj"]
                )
                loss_g = loss_g + 0.2 * L.infonce_loss(
                    aux_f["local_proj"], aux_f["global_proj"]
                )
            return loss_d + loss_g, (
                new_g_collections, st2, loss_d, loss_g, lr_, lf_d
            )

        (_, (new_g_coll, new_d_coll, loss_d, loss_g, lr_, lf_)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                (d_state.params, g_state.params)
            )
        d_grads, g_grads = grads
        if cfg.axis_name:
            d_grads = jax.lax.pmean(d_grads, cfg.axis_name)
            g_grads = jax.lax.pmean(g_grads, cfg.axis_name)
        d_updates, d_opt = tx_d.update(d_grads, d_state.opt_state,
                                       d_state.params)
        g_updates, g_opt = tx_g.update(g_grads, g_state.opt_state,
                                       g_state.params)
        new_d = NetState(optax.apply_updates(d_state.params, d_updates),
                         new_d_coll, d_opt, d_state.step + 1)
        new_g = NetState(optax.apply_updates(g_state.params, g_updates),
                         new_g_coll, g_opt, g_state.step + 1)
        return new_g, new_d, {
            "errD": loss_d, "errG": loss_g,
            "D(x)": jnp.mean(lr_), "D(G(z))": jnp.mean(lf_),
        }

    def fused_step(g_state, d_state, d_drs_state, images, drs_images,
                   log_weights, key, global_step, aux=None):
        """One reference-equivalent training step (n_dis D upd + 1 G upd)."""
        if cfg.axis_name:
            # disjoint per-device index/latent streams: fold the mesh
            # coordinate into the key. Weighted resampling thus composes
            # with data parallelism — fixing the reference bug where
            # DistributedSampler silently dropped the score weights
            # (stylegan2/train_ffhq_phase2.py:35-45).
            key = jax.random.fold_in(key, jax.lax.axis_index(cfg.axis_name))
        gold_active = jnp.logical_and(cfg.gold, global_step >= cfg.gold_step)
        topk_rate = (
            L.topk_rate_at(global_step, cfg.epoch_steps) if cfg.topk else 1.0
        )
        metrics = {}
        n, bs = cfg.n_dis, cfg.batch_size
        fakes_main = fakes_drs = None
        if cfg.fuse_g:
            # One batched stop-grad G forward serves every D update this
            # step (n_dis slices for netD, n_dis more for netD_drs).
            n_fake = n * bs * (2 if cfg.use_drs else 1)
            k_zall, k_grng = jax.random.split(jax.random.fold_in(key, n))
            z_all = jax.random.normal(k_zall, (n_fake, cfg.nz))
            fakes_all, _ = gen_fwd(
                g_state.params, g_state.state, z_all, k_grng, mutable=False
            )
            fakes_all = jax.lax.stop_gradient(fakes_all)
            tail = fakes_all.shape[1:]
            fakes_main = fakes_all[: n * bs].reshape((n, bs) + tail)
            fakes_drs = (
                fakes_all[n * bs :].reshape((n, bs) + tail)
                if cfg.use_drs else None
            )

        def iter_fakes(k_z, k_rng):
            z = jax.random.normal(k_z, (bs, cfg.nz))
            f, _ = gen_fwd(g_state.params, g_state.state, z, k_rng,
                           mutable=False)
            return jax.lax.stop_gradient(f)

        for i in range(n):
            k_iter = jax.random.fold_in(key, i)
            k_idx, k_z, k_rng, k_didx, k_dz, k_gz = jax.random.split(k_iter, 6)
            idx = _sample_idx(k_idx, num_data, log_weights, (bs,))
            real = _gather(images, idx, cfg.quantized)
            fakes_i = fakes_main[i] if cfg.fuse_g else iter_fakes(k_z, k_rng)
            d_state, d_metrics = d_step(
                d_state, tx_d, d_fwd, cfg.loss_type, real, fakes_i,
                k_rng, gold_active,
            )
            if cfg.use_drs:
                didx = sample_uniform_indices(k_didx, drs_num_data, (bs,))
                drs_real = _gather(drs_images, didx, cfg.quantized)
                fakes_di = (fakes_drs[i] if cfg.fuse_g
                            else iter_fakes(k_dz, k_rng))
                d_drs_state, drs_metrics = d_step(
                    d_drs_state, tx_d_drs, d_drs_fwd, cfg.drs_loss_type,
                    drs_real, fakes_di, k_rng, jnp.asarray(False),
                )
                metrics["errD_drs"] = drs_metrics["errD"]
            if i == cfg.n_dis - 1:
                gz = jax.random.normal(k_gz, (bs, cfg.nz))
                g_state, d_state, g_metrics = g_step(
                    g_state, d_state, gz, k_rng, topk_rate, aux
                )
                metrics.update(g_metrics)
            metrics.update(d_metrics)
        if cfg.topk:
            metrics["topk_rate"] = topk_rate
        return g_state, d_state, d_drs_state, metrics

    def fused_step_simultaneous(g_state, d_state, d_drs_state, images,
                                drs_images, log_weights, key, global_step,
                                aux=None):
        """fused_step with the last D update and the G update merged
        (cfg.simultaneous_g). First n_dis-1 D updates are sequential as
        usual; DRS-D keeps its own n_dis updates."""
        if cfg.axis_name:
            key = jax.random.fold_in(key, jax.lax.axis_index(cfg.axis_name))
        gold_active = jnp.logical_and(cfg.gold, global_step >= cfg.gold_step)
        topk_rate = (
            L.topk_rate_at(global_step, cfg.epoch_steps) if cfg.topk else 1.0
        )
        metrics = {}
        n, bs = cfg.n_dis, cfg.batch_size

        def iter_fakes(k_z, k_rng):
            z = jax.random.normal(k_z, (bs, cfg.nz))
            f, _ = gen_fwd(g_state.params, g_state.state, z, k_rng,
                           mutable=False)
            return jax.lax.stop_gradient(f)

        for i in range(n):
            k_iter = jax.random.fold_in(key, i)
            k_idx, k_z, k_rng, k_didx, k_dz, _ = jax.random.split(k_iter, 6)
            idx = _sample_idx(k_idx, num_data, log_weights, (bs,))
            real = _gather(images, idx, cfg.quantized)
            if i == n - 1:
                z = jax.random.normal(k_z, (bs, cfg.nz))
                g_state, d_state, gd_metrics = gd_step(
                    g_state, d_state, real, z, k_rng, gold_active, topk_rate
                )
                metrics.update(gd_metrics)
            else:
                d_state, d_metrics = d_step(
                    d_state, tx_d, d_fwd, cfg.loss_type, real,
                    iter_fakes(k_z, k_rng), k_rng, gold_active,
                )
                metrics.update(d_metrics)
            if cfg.use_drs:
                didx = sample_uniform_indices(k_didx, drs_num_data, (bs,))
                drs_real = _gather(drs_images, didx, cfg.quantized)
                d_drs_state, drs_metrics = d_step(
                    d_drs_state, tx_d_drs, d_drs_fwd, cfg.drs_loss_type,
                    drs_real, iter_fakes(k_dz, k_rng), k_rng,
                    jnp.asarray(False),
                )
                metrics["errD_drs"] = drs_metrics["errD"]
        if cfg.topk:
            metrics["topk_rate"] = topk_rate
        return g_state, d_state, d_drs_state, metrics

    if cfg.simultaneous_g:
        if g_aux_loss is not None:
            raise ValueError(
                "simultaneous_g is incompatible with g_aux_loss hooks"
            )
        return fused_step_simultaneous
    return fused_step


def make_train_chunk(fused_step, chunk_size: int, donate=True):
    """Scan `chunk_size` fused steps in one jitted call.

    Host round-trips (metric readout, step bookkeeping) amortize over the
    chunk; metrics are returned stacked [chunk_size, ...].
    """

    def chunk(g_state, d_state, d_drs_state, images, drs_images, log_weights,
              key, start_step, aux=None):
        def body(carry, step_offset):
            g, d, ddrs = carry
            step = start_step + step_offset
            k = jax.random.fold_in(key, step_offset)
            g, d, ddrs, metrics = fused_step(
                g, d, ddrs, images, drs_images, log_weights, k, step, aux
            )
            return (g, d, ddrs), metrics

        (g_state, d_state, d_drs_state), metrics = jax.lax.scan(
            body, (g_state, d_state, d_drs_state),
            jnp.arange(chunk_size, dtype=jnp.int32),
        )
        return g_state, d_state, d_drs_state, metrics

    return jax.jit(chunk, donate_argnums=(0, 1, 2) if donate else ())

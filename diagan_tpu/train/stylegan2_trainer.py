"""StyleGAN2 training loop (FFHQ) — phases 1 and 2.

Behavioral parity with reference stylegan2/train_ffhq.py /
train_ffhq_phase2.py:
  - non-saturating logistic losses (:67-86), lazy R1 every d_reg_every=16
    steps (:246-258; weight 0.1 phase 1 / 10 phase 2), path-length
    regularization every g_reg_every=4 with batch shrink 2 (:278-297),
    regularization-ratio-scaled Adam lr/betas (:538-550),
  - G-EMA with decay 0.5**(32/10000) accumulated every step (:53-58,320),
  - style mixing with p=0.9 (:114-119),
  - ADA with adaptive p (non_leaking.py), r1/path carry through,
  - phase 2: weighted resampling stream + twin drs discriminator trained
    in the same step from uniform data (train_ffhq_phase2.py:212-244) —
    here the weights COMPOSE with data parallelism instead of being
    dropped by DistributedSampler (reference bug, :35-45),
  - per-example logit recording by dataset index across the mesh,
  - checkpoint dict {g, d, [drs_d], g_ema, optims, ada_aug_p} every 5k
    steps named {iter:06d}.pt (:365-379).

TPU design: four jitted step programs (plain / d-reg / g-reg / both) are
dispatched host-side by step index — grad-of-grad regularizers compile
once each instead of branching inside one program. EMA is a jnp tree op
fused into each step.
"""
from __future__ import annotations

import math
import signal
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from diagan_tpu.data.sampler import (
    log_weights_from_scores,
    sample_uniform_indices,
    sample_weighted_indices,
)
from diagan_tpu.models import losses as L
from diagan_tpu.models.ada import AdaptiveAugment, augment
from diagan_tpu.train.state import NetState

EMA_DECAY = 0.5 ** (32 / (10 * 1000))


def reg_ratio_adam(lr, reg_every):
    # reg_every=0 -> lazy reg statically disabled: no ratio adjustment
    # (reference train_ffhq.py:481-482 always has a reg interval; the
    # disable switch is an additive probe/ablation feature)
    ratio = reg_every / (reg_every + 1) if reg_every else 1.0
    return optax.adam(lr * ratio, b1=0.0 ** ratio, b2=0.99**ratio)


class StyleGAN2Trainer:
    def __init__(
        self,
        output_path,
        gen,
        disc,
        dataset_images,
        num_steps,
        drs_disc=None,
        sample_weights=None,
        batch_size=16,
        lr=0.002,
        r1_weight=10.0,
        path_regularize=2.0,
        d_reg_every=16,
        g_reg_every=4,
        path_batch_shrink=2,
        mixing=0.9,
        augment_p=0.0,  # 0 -> adaptive ADA
        ada_target=0.6,
        ada_length=500_000,
        ada_pad_frac=0.75,  # static ADA reflect pad (models/ada.py): 0.75
        # covers the full transform distribution; smaller trades far-tail
        # edge clamping for step time (the augment backward scales with
        # (1+2*pad_frac)^2 — docs/ROADMAP.md 3b)
        ada_pad_buckets=True,  # extent-bucketed pad: each augment call
        # lax.switches to the smallest of {h/4, h/2, ada_pad_frac*h}
        # covering its batch's transforms (models/ada.py pad_buckets) —
        # several-fold cheaper augment at typical ada_p, fp-identical
        # within coverage. True -> (0.25, 0.5) capped by ada_pad_frac;
        # False -> single static pad; tuple -> explicit buckets.
        save_every=5000,
        log_every=100,
        logit_save_steps=None,
        save_logit_after=0,
        stop_save_logit_after=10**9,
        seed=0,
        mesh=None,
        axis_name="data",
        stream_data=None,
        hbm_data_budget=6 << 30,
        fuse_steps=True,
        max_chunk=None,  # cap steps per fused dispatch (_next_boundary)
    ):
        # fuse_steps=False: dispatch D / DRS-D / R1 / G / path-reg as
        # SEPARATE jitted programs per step instead of one scanned chunk.
        # Costs ~0.8s/dispatch x 3-5 programs on this platform, so it only
        # makes sense where the step itself is >~1s — exactly the large
        # configs (256px batch>=64, 1024px batch>=8) whose fused scan
        # program the remote compile service rejects (VALIDATION.md).
        # Composes with stream_data (per-step host batches). Single-chip.
        # For activation rematerialization construct the models with
        # remat=True (StyleGAN2Generator/Discriminator) — per-layer
        # nn.remat is the memory lever; wrapping the whole apply in
        # jax.checkpoint does NOT reduce peak (the backward recomputes
        # the full forward and keeps every residual live; measured: same
        # compile-time OOM at 256px batch 64).
        # stream_data: None = auto (stream when the uint8 dataset exceeds
        # hbm_data_budget bytes), True/False = force. In streaming mode the
        # dataset stays host-resident (np.memmap-friendly); each scanned
        # chunk receives its real batches as a small uint8 stack assembled
        # by the native runtime (alias-method weighted sampling + threaded
        # gather, native/diagan_io.cpp) — this is what makes full-scale
        # FFHQ-256 (13.8GB) trainable on a single chip. The fake/augment
        # RNG streams match the HBM mode; the real-batch index stream is
        # host-side (documented deviation within an already-stochastic
        # sampler).
        # Optional data parallelism: with a Mesh, every step program is
        # shard_map'd with replicated states, per-device key streams
        # (axis-index folding) and pmean gradient reduction; batch_size is
        # per-device (matching the reference's --batch per-GPU semantics).
        self.mesh = mesh
        self.axis_name = axis_name if mesh is not None else None
        self._mesh_n = (
            int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
        )
        self.fuse = bool(fuse_steps)
        if not self.fuse and mesh is not None:
            raise NotImplementedError("fuse_steps=False requires mesh=None")
        self.output_path = Path(output_path)
        self.output_path.mkdir(parents=True, exist_ok=True)
        self.gen = gen
        self.disc = disc
        self.drs_disc = drs_disc
        self.num_steps = num_steps
        self.batch_size = batch_size
        self.d_reg_every = d_reg_every
        self.g_reg_every = g_reg_every
        self.path_batch_shrink = path_batch_shrink
        self.r1_weight = r1_weight
        self.path_regularize = path_regularize
        self.mixing = mixing
        self.save_every = save_every
        self.log_every = log_every
        self.logit_save_steps = logit_save_steps
        self.max_chunk = int(max_chunk) if max_chunk else None
        self.save_logit_after = save_logit_after
        self.stop_save_logit_after = stop_save_logit_after
        self.seed = seed
        self.key = jax.random.key(seed)
        self.style_dim = gen.style_dim
        self.n_latent = int(math.log2(gen.size)) * 2 - 2

        self.num_data = len(dataset_images)
        if stream_data is None:
            stream_data = dataset_images.nbytes > hbm_data_budget
        self.stream = bool(stream_data)
        if self.stream:
            # Composes with a mesh: the host assembles GLOBAL
            # (bs * n_devices) batch stacks and shard_map splits them over
            # the data axis (see _jit data_args); weighted sampling stays
            # a single global stream, so score resampling survives data
            # parallelism exactly as in the HBM mode (the fix for the
            # reference's DistributedSampler-drops-weights bug,
            # train_ffhq_phase2.py:35-45).
            from diagan_tpu.native import io as nio

            self.images = None
            self.images_np = dataset_images  # uint8 NHWC, host/memmap
            self._w_sampler = (
                nio.NativeWeightedSampler(sample_weights, seed=seed)
                if sample_weights is not None else None
            )
            self._u_rng = np.random.default_rng(seed + 1)
            self._gather = nio.gather_u8
        else:
            self.images = jnp.asarray(dataset_images)  # uint8 NHWC, HBM
        self.log_weights = (
            log_weights_from_scores(sample_weights)
            if sample_weights is not None else None
        )

        self.tx_g = reg_ratio_adam(lr, g_reg_every)
        self.tx_d = reg_ratio_adam(lr, d_reg_every)

        k1, k2, k3 = jax.random.split(self.key, 3)
        z0 = jnp.zeros((2, self.style_dim))
        x0 = jnp.zeros((2, gen.size, gen.size, 3))
        gv = gen.init({"params": k1, "noise": k1}, z0)
        dv = disc.init({"params": k2}, x0)
        self.g_state = NetState(gv["params"], {}, self.tx_g.init(gv["params"]),
                                jnp.zeros((), jnp.int32))
        self.d_state = NetState(dv["params"], {}, self.tx_d.init(dv["params"]),
                                jnp.zeros((), jnp.int32))
        self.g_ema = jax.tree.map(jnp.copy, gv["params"])
        self.pl_mean = jnp.zeros(())
        if drs_disc is not None:
            ddv = drs_disc.init({"params": k3}, x0)
            self.d_drs_state = NetState(
                ddv["params"], {}, self.tx_d.init(ddv["params"]),
                jnp.zeros((), jnp.int32),
            )
        else:
            self.d_drs_state = None

        # augment_p semantics (reference train_ffhq.py:27,127): None ->
        # augmentation statically OFF (no augment ops in any program, as
        # when the reference's --augment flag is absent); 0 -> adaptive
        # ADA; >0 -> fixed p. The static gate matters on TPU: at traced
        # p=0 the transforms are identities but the antialiased resample
        # still executes, so a no-ADA run must compile augment OUT.
        self.use_augment = augment_p is not None
        self.ada_pad_frac = float(ada_pad_frac)
        if ada_pad_buckets is True:
            self.ada_pad_buckets = tuple(
                f for f in (0.25, 0.5) if f < self.ada_pad_frac
            ) or None
        elif ada_pad_buckets:
            self.ada_pad_buckets = tuple(ada_pad_buckets)
        else:
            self.ada_pad_buckets = None
        self.ada = AdaptiveAugment(ada_target, ada_length) \
            if self.use_augment and augment_p == 0 else None
        # argparse can deliver an int literal 0 here; the augment pipeline
        # (jax.random.bernoulli) requires a float probability
        self.ada_aug_p = float(augment_p) if self.use_augment else 0.0
        self.logit_results = {}
        self._chunk_cap = None  # auto-sized dispatch cap (_observe_chunk)
        self._build_steps()

    # ------------------------------------------------------------------
    def _maybe_fold(self, key):
        if self.axis_name:
            return jax.random.fold_in(key, jax.lax.axis_index(self.axis_name))
        return key

    def _maybe_pmean(self, tree):
        if self.axis_name:
            return jax.lax.pmean(tree, self.axis_name)
        return tree

    def _maybe_psum(self, x):
        if self.axis_name:
            return jax.lax.psum(x, self.axis_name)
        return x

    def _jit(self, fn, n_args, data_args=()):
        """jit (single device) or shard_map+jit (mesh). Args listed in
        data_args are batch stacks [n, global_bs, ...] split over the data
        axis on dim 1; everything else is replicated."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        in_specs = tuple(
            P(None, self.axis_name) if i in data_args else P()
            for i in range(n_args)
        )
        return jax.jit(shard_map(
            fn, mesh=self.mesh, in_specs=in_specs,
            out_specs=P(), check_vma=False,
        ))

    def _gen_apply(self, params, z1, z2, cutoff, noise_key):
        return self.gen.apply(
            {"params": params}, [z1, z2], cutoff,
            method=type(self.gen).sample, rngs={"noise": noise_key},
        )

    def _disc_apply(self, disc, params, x):
        out = disc.apply({"params": params}, x)
        return out[0] if isinstance(out, tuple) else out

    def _build_steps(self):
        bs = self.batch_size
        sd = self.style_dim

        def draw_batch(key, weighted, images):
            # images/log_weights arrive as PROGRAM ARGUMENTS — closing over
            # the device-resident dataset would embed it as an HLO constant
            # (hundreds of MB: slow serialization, and >413-limit on the
            # remote-compile service at 512px)
            if weighted and self.log_weights is not None:
                idx = sample_weighted_indices(key, self.log_weights, (bs,))
            else:
                idx = sample_uniform_indices(key, self.num_data, (bs,))
            real = jnp.take(images, idx, axis=0)
            return real.astype(jnp.float32) / 127.5 - 1.0, idx

        def mixing_cutoff(key):
            kmix, kcut = jax.random.split(key)
            do_mix = jax.random.bernoulli(kmix, self.mixing)
            cut = jax.random.randint(kcut, (), 1, self.n_latent)
            return jnp.where(do_mix, cut, self.n_latent)

        def fakes(g_params, key):
            kz1, kz2, kc, kn = jax.random.split(key, 4)
            z1 = jax.random.normal(kz1, (bs, sd))
            z2 = jax.random.normal(kz2, (bs, sd))
            return self._gen_apply(g_params, z1, z2, mixing_cutoff(kc), kn)

        def build_variant(aug_live):
            """Build the step set with the ADA resample statically
            PRESENT (aug_live=True) or statically ABSENT (False).

            The host selects the variant per chunk from ada_aug_p
            (models/ada.py augment static_apply): no lax.cond on a
            runtime p inside the scanned program — the XLA-native
            shape for a chunk-constant decision, and the p=0 variant
            carries zero augment code (round 3's lax.cond skip only
            avoided executing it). The cond was also the initial
            suspect for the fused-256 worker crashes at p > 0; the
            bisection (scripts/probe_cond_pallas.py) exonerated it —
            the platform kills device programs running much past a
            minute, which ADA-live 100-step chunks exceed (see
            max_chunk in _next_boundary).
            """
            def d_step_for(disc, tx, weighted):
                def step(d_state, g_params, key, ada_p, images, real_u8=None):
                    key = self._maybe_fold(key)
                    kdata, kfake, kaug1, kaug2 = jax.random.split(key, 4)
                    if real_u8 is not None:  # host-streamed batch (uint8)
                        real = real_u8.astype(jnp.float32) / 127.5 - 1.0
                    else:
                        real, _ = draw_batch(kdata, weighted, images)
                    fake = jax.lax.stop_gradient(fakes(g_params, kfake))
                    if self.use_augment:
                        real_a = augment(real, kaug1, ada_p,
                                         pad_frac=self.ada_pad_frac,
                                         pad_buckets=self.ada_pad_buckets,
                                         static_apply=aug_live)
                        fake_a = augment(fake, kaug2, ada_p,
                                         pad_frac=self.ada_pad_frac,
                                         pad_buckets=self.ada_pad_buckets,
                                         static_apply=aug_live)
                    else:
                        real_a, fake_a = real, fake

                    def loss_fn(p):
                        rp = self._disc_apply(disc, p, real_a)
                        fp = self._disc_apply(disc, p, fake_a)
                        return L.d_logistic_loss(rp, fp), (rp, fp)

                    (loss, (rp, fp)), grads = jax.value_and_grad(
                        loss_fn, has_aux=True
                    )(d_state.params)
                    grads = self._maybe_pmean(grads)
                    updates, opt = tx.update(grads, d_state.opt_state, d_state.params)
                    params = optax.apply_updates(d_state.params, updates)
                    return (
                        NetState(params, {}, opt, d_state.step + 1),
                        {"d": loss, "real_score": jnp.mean(rp),
                         "fake_score": jnp.mean(fp),
                         "sign_real": self._maybe_psum(jnp.sum(jnp.sign(rp)))},
                    )
                return step

            def d_r1_for(disc, tx, weighted):
                def step(d_state, key, ada_p, images, real_u8=None):
                    key = self._maybe_fold(key)
                    kdata, kaug = jax.random.split(key)
                    if real_u8 is not None:
                        real = real_u8.astype(jnp.float32) / 127.5 - 1.0
                    else:
                        real, _ = draw_batch(kdata, weighted, images)
                    if self.use_augment:
                        real = augment(real, kaug, ada_p,
                                       pad_frac=self.ada_pad_frac,
                                         pad_buckets=self.ada_pad_buckets,
                                       static_apply=aug_live)

                    def r1_fn(p):
                        def score(x):
                            return jnp.sum(self._disc_apply(disc, p, x))

                        g = jax.grad(score)(real)
                        pen = jnp.sum(g.reshape(bs, -1) ** 2) / bs
                        # lazy-reg weighting (train_ffhq.py:255-258)
                        return self.r1_weight / 2 * pen * self.d_reg_every, pen

                    (loss, pen), grads = jax.value_and_grad(r1_fn, has_aux=True)(
                        d_state.params
                    )
                    grads = self._maybe_pmean(grads)
                    updates, opt = tx.update(grads, d_state.opt_state, d_state.params)
                    params = optax.apply_updates(d_state.params, updates)
                    return NetState(params, {}, opt, d_state.step), {"r1": pen}
                return step

            d_plain = d_step_for(self.disc, self.tx_d, True)
            drs_plain = (
                d_step_for(self.drs_disc, self.tx_d, False)
                if self.drs_disc is not None else None
            )
            d_r1_raw = d_r1_for(self.disc, self.tx_d, True)
            drs_r1_raw = (
                d_r1_for(self.drs_disc, self.tx_d, False)
                if self.drs_disc is not None else None
            )

            def g_step(g_state, g_ema, d_params, key, ada_p):
                key = self._maybe_fold(key)
                kfake, kaug = jax.random.split(key)

                def loss_fn(p):
                    fake = fakes(p, kfake)
                    # the reference augments the fake before D scores it
                    # (train_ffhq.py:265-266) — the generator gradient flows
                    # THROUGH the augmentation; skipping it would let G train
                    # against a D input distribution D itself never sees
                    if self.use_augment:
                        fake = augment(fake, kaug, ada_p,
                                       pad_frac=self.ada_pad_frac,
                                         pad_buckets=self.ada_pad_buckets,
                                       static_apply=aug_live)
                    fp = self._disc_apply(self.disc, d_params, fake)
                    return L.g_nonsaturating_loss(fp)

                loss, grads = jax.value_and_grad(loss_fn)(g_state.params)
                grads = self._maybe_pmean(grads)
                updates, opt = self.tx_g.update(grads, g_state.opt_state,
                                                g_state.params)
                params = optax.apply_updates(g_state.params, updates)
                g_ema = jax.tree.map(
                    lambda e, p: e * EMA_DECAY + p * (1 - EMA_DECAY), g_ema, params
                )
                return (
                    NetState(params, {}, opt, g_state.step + 1), g_ema, {"g": loss}
                )

            # Fused step (D [+DRS-D] [+R1] + G [+path reg] + EMA) scanned in
            # chunks: on this platform each dispatch costs O(100ms)+, so the
            # 3-6 programs/step of a naive loop dominate wall clock. The lazy
            # regularizers fire inside the scan via lax.cond at the reference
            # cadence and intra-step position (d -> r1 -> g -> path,
            # reference train_ffhq.py:212-311), letting one dispatch cover
            # the full stretch between logging boundaries.
            def full_step(g_state, d_state, d_drs_state, g_ema, pl_mean, key,
                          ada_p, gstep, images, step_xs=None, r1_xs=None,
                          r1_slot=None):
                # step_xs: host-streamed per-step uint8 batches
                # ({'d','drs'}), r1_xs: per-chunk r1 batch stacks
                # [n_r1_max, bs, ...] indexed by r1_slot (only read inside the
                # cond branch, so non-R1 steps never touch them)
                xs_d = step_xs["d"] if step_xs is not None else None
                xs_dd = step_xs.get("drs") if step_xs is not None else None
                kd, kdd, kg, kr1, kpl = jax.random.split(key, 5)
                d_state, dm = d_plain(d_state, g_state.params, kd, ada_p, images,
                                      xs_d)
                if drs_plain is not None:
                    d_drs_state, _ = drs_plain(
                        d_drs_state, g_state.params, kdd, ada_p, images, xs_dd
                    )

                def with_r1(args):
                    d, dd = args
                    r1_d = r1_dd = None
                    if r1_xs is not None:
                        r1_d = jnp.take(r1_xs["d"], r1_slot, axis=0)
                        if "drs" in r1_xs:
                            r1_dd = jnp.take(r1_xs["drs"], r1_slot, axis=0)
                    d, rm = d_r1_raw(d, kr1, ada_p, images, r1_d)
                    if drs_r1_raw is not None:
                        dd, _ = drs_r1_raw(dd, kr1, ada_p, images, r1_dd)
                    return d, dd, rm["r1"]

                def no_r1(args):
                    d, dd = args
                    return d, dd, jnp.zeros(())

                if self.d_reg_every:
                    d_state, d_drs_state, r1_pen = jax.lax.cond(
                        gstep % self.d_reg_every == 0, with_r1, no_r1,
                        (d_state, d_drs_state),
                    )
                else:  # reg_every=0: R1 statically absent from the program
                    r1_pen = jnp.zeros(())

                g_state, g_ema, gm = g_step(g_state, g_ema, d_state.params, kg,
                                            ada_p)

                def with_path(args):
                    g, ema, plm = args
                    g, ema, new_m, pm = g_path_reg(g, ema, kpl, plm)
                    return g, ema, new_m, pm["path"]

                def no_path(args):
                    g, ema, plm = args
                    return g, ema, plm, jnp.zeros(())

                if self.g_reg_every:
                    g_state, g_ema, pl_mean, path_pen = jax.lax.cond(
                        gstep % self.g_reg_every == 0, with_path, no_path,
                        (g_state, g_ema, pl_mean),
                    )
                else:  # reg_every=0: path-reg statically absent
                    path_pen = jnp.zeros(())
                metrics = {**dm, **gm, "r1": r1_pen, "path": path_pen}
                return g_state, d_state, d_drs_state, g_ema, pl_mean, metrics


            def make_chunk(n):
                # per-step RNG is keyed by the ABSOLUTE step
                # (fold_in(base_key, start_step + i)), so the stream — and
                # therefore the whole run — is invariant to how the host
                # splits steps into dispatches. This is what lets the
                # dispatch envelope auto-size (_observe_chunk) without
                # breaking bitwise-deterministic resume.
                def chunk(g_state, d_state, d_drs_state, g_ema, pl_mean, key,
                          ada_p, start_step, images):
                    def body(carry, i):
                        g, d, dd, ema, plm = carry
                        g, d, dd, ema, plm, m = full_step(
                            g, d, dd, ema, plm,
                            jax.random.fold_in(key, start_step + i),
                            ada_p, start_step + i, images,
                        )
                        return (g, d, dd, ema, plm), m

                    (g_state, d_state, d_drs_state, g_ema, pl_mean), ms = \
                        jax.lax.scan(
                            body,
                            (g_state, d_state, d_drs_state, g_ema, pl_mean),
                            jnp.arange(n, dtype=jnp.int32),
                        )
                    return g_state, d_state, d_drs_state, g_ema, pl_mean, ms

                return self._jit(chunk, 9)

            def make_stream_chunk(n):
                def chunk(g_state, d_state, d_drs_state, g_ema, pl_mean, key,
                          ada_p, start_step, step_xs, r1_xs):
                    # reg disabled (0) -> no slot ever selected
                    dre = self.d_reg_every or 10**9
                    first_slot_step = (start_step + dre - 1) // dre

                    def body(carry, scanned):
                        i, xs = scanned
                        g, d, dd, ema, plm = carry
                        gstep = start_step + i
                        slot = jnp.clip(gstep // dre - first_slot_step, 0, None)
                        g, d, dd, ema, plm, m = full_step(
                            g, d, dd, ema, plm,
                            jax.random.fold_in(key, gstep),
                            ada_p, gstep, None, xs, r1_xs, slot,
                        )
                        return (g, d, dd, ema, plm), m

                    (g_state, d_state, d_drs_state, g_ema, pl_mean), ms = \
                        jax.lax.scan(
                            body,
                            (g_state, d_state, d_drs_state, g_ema, pl_mean),
                            (jnp.arange(n, dtype=jnp.int32), step_xs),
                        )
                    return g_state, d_state, d_drs_state, g_ema, pl_mean, ms

                return self._jit(chunk, 10, data_args=(8, 9))


            def g_path_reg(g_state, g_ema, key, pl_mean):
                key = self._maybe_fold(key)
                pbs = max(1, bs // self.path_batch_shrink)
                kz, kn, knoise = jax.random.split(key, 3)
                z = jax.random.normal(kz, (pbs, sd))

                def gen_from_w_loss(p):
                    w = self.gen.apply({"params": p}, z,
                                       method=lambda m, z: m.mapping(z))
                    styles = jnp.repeat(w[:, None, :], self.n_latent, axis=1)

                    def synth(styles):
                        return self.gen.apply(
                            {"params": p}, styles,
                            method=lambda m, s: m.synthesis(s),
                            rngs={"noise": knoise},
                        )

                    imgs, vjp_fn = jax.vjp(synth, styles)
                    h, wd = imgs.shape[1], imgs.shape[2]
                    noise = jax.random.normal(kn, imgs.shape) / math.sqrt(h * wd)
                    (grads_w,) = vjp_fn(noise)
                    lengths = jnp.sqrt(
                        jnp.sum(grads_w**2, axis=(1, 2)) + 1e-12
                    )
                    new_mean = pl_mean + 0.01 * (jnp.mean(lengths) - pl_mean)
                    penalty = jnp.mean((lengths - new_mean) ** 2)
                    weighted = (
                        self.path_regularize * self.g_reg_every * penalty
                        # keep a live dependence on outputs (reference adds
                        # 0 * fake[0,0,0,0], train_ffhq.py:294)
                        + 0.0 * jnp.sum(imgs[:1])
                    )
                    return weighted, (penalty, lengths, new_mean)

                (loss, (pen, lengths, new_mean)), grads = jax.value_and_grad(
                    gen_from_w_loss, has_aux=True
                )(g_state.params)
                grads = self._maybe_pmean(grads)
                updates, opt = self.tx_g.update(grads, g_state.opt_state,
                                                g_state.params)
                params = optax.apply_updates(g_state.params, updates)
                g_ema = jax.tree.map(
                    lambda e, p: e * EMA_DECAY + p * (1 - EMA_DECAY), g_ema, params
                )
                return (
                    NetState(params, {}, opt, g_state.step), g_ema, new_mean,
                    {"path": pen, "path_length": jnp.mean(lengths)},
                )

            uf = None
            if not self.fuse:
                # separate per-piece programs (compile-service-friendly); the
                # RNG stream (fold_in per step, 5-way split, kd/kdd/kg/kr1/kpl)
                # matches the fused chunk exactly. State args are donated —
                # without aliasing, each piece holds a second params+optimizer
                # copy, which alone overflowed HBM at 256px batch 64 (by 90MB)
                uf = {
                    "d": jax.jit(d_plain, donate_argnums=0),
                    "drs": (
                        jax.jit(drs_plain, donate_argnums=0)
                        if drs_plain is not None else None
                    ),
                    "d_r1": jax.jit(d_r1_raw, donate_argnums=0),
                    "drs_r1": (
                        jax.jit(drs_r1_raw, donate_argnums=0)
                        if drs_r1_raw is not None else None
                    ),
                    "g": jax.jit(g_step, donate_argnums=(0, 1)),
                    "path": jax.jit(g_path_reg, donate_argnums=(0, 1)),
                }

            return {"make_chunk": make_chunk,
                    "make_stream_chunk": make_stream_chunk,
                    "uf": uf}

        self._plain_chunks = {}  # keyed (n, aug_live)
        self._variants = {}

        def variant(live):
            if live not in self._variants:
                self._variants[live] = build_variant(live)
            return self._variants[live]

        self._variant = variant

        def _mk(n, live=False):
            return variant(live)["make_chunk"](n)

        def _mks(n, live=False):
            return variant(live)["make_stream_chunk"](n)

        self._make_chunk = _mk
        self._make_stream_chunk = _mks

    def _host_batch(self, weighted):
        """One (bs,)-batch of uint8 reals gathered on host (stream mode)."""
        if weighted and self._w_sampler is not None:
            idx = self._w_sampler.sample(self.batch_size)
        else:
            idx = self._u_rng.integers(0, self.num_data, self.batch_size)
        return jnp.asarray(self._gather(self.images_np, idx))

    def _aug_live(self):
        """Host-side per-chunk selection of the augment-program variant
        (ada_aug_p is chunk-constant; see build_variant)."""
        return bool(self.use_augment and self.ada_aug_p > 0)

    def _chunk_for(self, n):
        key = (n, self._aug_live())
        if key not in self._plain_chunks:
            mk = (self._make_stream_chunk if self.stream
                  else self._make_chunk)
            self._plain_chunks[key] = mk(n, key[1])
        return self._plain_chunks[key]

    def _run_unfused(self, key, start_step, n):
        """n steps as separate dispatches; returns the same stacked-metrics
        dict shape the fused chunk produces. In stream mode each piece gets
        a per-step host-gathered uint8 batch instead of the HBM dataset;
        dispatches are async, so gathers overlap device compute."""
        out = {k: [] for k in ("d", "real_score", "fake_score", "sign_real",
                               "g", "r1", "path")}
        uf = self._variant(self._aug_live())["uf"]
        images = None if self.stream else self.images

        def real_kw(weighted):
            if not self.stream:
                return {}
            return {"real_u8": self._host_batch(weighted)}

        for i in range(n):
            gstep = start_step + i
            k = jax.random.fold_in(key, gstep)
            kd, kdd, kg, kr1, kpl = jax.random.split(k, 5)
            self.d_state, dm = uf["d"](
                self.d_state, self.g_state.params, kd, self.ada_aug_p,
                images, **real_kw(True),
            )
            if uf["drs"] is not None:
                self.d_drs_state, _ = uf["drs"](
                    self.d_drs_state, self.g_state.params, kdd,
                    self.ada_aug_p, images, **real_kw(False),
                )
            if self.d_reg_every and gstep % self.d_reg_every == 0:
                self.d_state, rm = uf["d_r1"](
                    self.d_state, kr1, self.ada_aug_p, images,
                    **real_kw(True),
                )
                if uf["drs_r1"] is not None:
                    self.d_drs_state, _ = uf["drs_r1"](
                        self.d_drs_state, kr1, self.ada_aug_p, images,
                        **real_kw(False),
                    )
                r1v = rm["r1"]
            else:
                r1v = 0.0
            self.g_state, self.g_ema, gm = uf["g"](
                self.g_state, self.g_ema, self.d_state.params, kg,
                self.ada_aug_p,
            )
            if self.g_reg_every and gstep % self.g_reg_every == 0:
                self.g_state, self.g_ema, self.pl_mean, pm = uf["path"](
                    self.g_state, self.g_ema, kpl, self.pl_mean,
                )
                pathv = pm["path"]
            else:
                pathv = 0.0
            for name, v in (("d", dm["d"]), ("real_score", dm["real_score"]),
                            ("fake_score", dm["fake_score"]),
                            ("sign_real", dm["sign_real"]), ("g", gm["g"]),
                            ("r1", r1v), ("path", pathv)):
                out[name].append(v)
        return {k: np.asarray([np.asarray(x) for x in v])
                for k, v in out.items()}



    # ------------------------------------------------------------------
    def _host_stacks(self, start, n):
        """Assemble one chunk's real batches on host (streaming mode):
        weighted indices from the native alias sampler, pixels via the
        threaded native gather (mmap-friendly). Returns
        (step_xs {'d'[,'drs']}: [n, bs, ...] uint8,
         r1_xs same keys: [n//dre+1, bs, ...] uint8 — slot j = j-th R1
         firing inside this chunk; unfired slots stay zero, never read).
        Under a mesh, bs here is the GLOBAL batch (per-device bs x devices);
        shard_map splits dim 1 across the data axis."""
        bs = self.batch_size * self._mesh_n
        dre = self.d_reg_every or 10**9
        shape = self.images_np.shape[1:]

        def draw(count, weighted):
            if weighted and self._w_sampler is not None:
                return self._w_sampler.sample(count)
            return self._u_rng.integers(0, self.num_data, count)

        xs = {
            "d": jnp.asarray(
                self._gather(self.images_np, draw(n * bs, True))
                .reshape((n, bs) + shape)
            )
        }
        if self.drs_disc is not None:
            xs["drs"] = jnp.asarray(
                self._gather(self.images_np, draw(n * bs, False))
                .reshape((n, bs) + shape)
            )
        n_slots = n // dre + 1  # static in n -> one compiled program per n
        r1 = {"d": np.zeros((n_slots, bs) + shape, np.uint8)}
        if self.drs_disc is not None:
            r1["drs"] = np.zeros_like(r1["d"])
        fires = [i for i in range(n) if (start + i) % dre == 0]
        for j, i in enumerate(fires):
            r1["d"][j] = self._gather(self.images_np, draw(bs, True))
            if self.drs_disc is not None:
                r1["drs"][j] = self._gather(self.images_np, draw(bs, False))
        return xs, {k: jnp.asarray(v) for k, v in r1.items()}

    def _record_logits(self, step, batch=64):
        """Full-dataset D sweep (the reference's per-example logit
        recording, train_ffhq.py:128-161) as ONE jitted lax.scan over
        batches — no host round-trip per batch (the reference syncs on
        every DataLoader batch)."""
        disc = self.drs_disc if self.drs_disc is not None else self.disc
        params = (
            self.d_drs_state.params if self.drs_disc is not None
            else self.d_state.params
        )
        name = "netD_drs" if self.drs_disc is not None else "netD"

        if self.stream:
            # slab the host dataset through one jitted per-slab sweep
            # (uint8 across the link, one dispatch per slab)
            slab_batches = 64  # 64*batch images per dispatch
            if not hasattr(self, "_slab_sweep"):
                @jax.jit
                def slab_sweep(params, slab):  # [nb, batch, ...] uint8
                    def body(_, x):
                        x = x.astype(jnp.float32) / 127.5 - 1.0
                        return None, self._disc_apply(disc, params, x)

                    _, logits = jax.lax.scan(body, None, slab)
                    return logits.reshape(-1)

                self._slab_sweep = slab_sweep
            S = slab_batches * batch
            out = np.empty(self.num_data, np.float64)
            for lo in range(0, self.num_data, S):
                idx = np.arange(lo, lo + S).clip(max=self.num_data - 1)
                slab = self._gather(self.images_np, idx).reshape(
                    (slab_batches, batch) + self.images_np.shape[1:]
                )
                got = np.asarray(self._slab_sweep(params, jnp.asarray(slab)))
                take = min(S, self.num_data - lo)
                out[lo:lo + take] = got[:take]
            self.logit_results.setdefault(f"{name}_eval", {})[step] = out
            return

        if not hasattr(self, "_logit_sweep"):
            n_batches = -(-self.num_data // batch)
            idx_all = jnp.arange(n_batches * batch, dtype=jnp.int32) \
                .clip(max=self.num_data - 1).reshape(n_batches, batch)

            @jax.jit
            def sweep(params, images):
                def body(_, idx):
                    x = jnp.take(images, idx, axis=0)
                    x = x.astype(jnp.float32) / 127.5 - 1.0
                    return None, self._disc_apply(disc, params, x)

                _, logits = jax.lax.scan(body, None, idx_all)
                return logits.reshape(-1)[: self.num_data]

            self._logit_sweep = sweep
        out = np.asarray(self._logit_sweep(params, self.images),
                         dtype=np.float64)
        self.logit_results.setdefault(f"{name}_eval", {})[step] = out

    def _save_ckpt(self, step):
        payload = {
            "g": jax.device_get(self.g_state.params),
            "d": jax.device_get(self.d_state.params),
            "g_ema": jax.device_get(self.g_ema),
            "g_optim": jax.device_get(self.g_state.opt_state),
            "d_optim": jax.device_get(self.d_state.opt_state),
            "ada_aug_p": self.ada_aug_p,
            # additive vs the reference dict (which resets mean_path_length
            # on resume, train_ffhq.py:167): carrying it makes resume
            # bitwise-identical to an uninterrupted run
            "pl_mean": float(np.asarray(self.pl_mean)),
            "step": step,
        }
        if self.d_drs_state is not None:
            payload["drs_d"] = jax.device_get(self.d_drs_state.params)
            payload["drs_d_optim"] = jax.device_get(self.d_drs_state.opt_state)
        path = self.output_path / "checkpoint" / f"{step:06d}.pt"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            # to_bytes handles optax tuple states via to_state_dict
            f.write(serialization.to_bytes(payload))
        self._ckpt_template = payload
        if self.logit_results:
            import pickle

            for nm, res in self.logit_results.items():
                with open(self.output_path / f"logits_{nm.split('_')[0]}.pkl",
                          "wb") as f:
                    pickle.dump({k: np.float64(v) for k, v in res.items()}, f)

    def find_latest_ckpt(self):
        """Latest checkpoint by filename-parsed step (the reference resumes
        by parsing {iter:06d}.pt, train_ffhq.py:552-570)."""
        d = self.output_path / "checkpoint"
        if not d.is_dir():
            return None
        cands = sorted(d.glob("*.pt"))
        return cands[-1] if cands else None

    def load_ckpt(self, path):
        template = {
            "g": jax.device_get(self.g_state.params),
            "d": jax.device_get(self.d_state.params),
            "g_ema": jax.device_get(self.g_ema),
            "g_optim": jax.device_get(self.g_state.opt_state),
            "d_optim": jax.device_get(self.d_state.opt_state),
            "ada_aug_p": 0.0,
            "step": 0,
        }
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] == b"PK\x03\x04":
            # A reference torch {iter:06d}.pt (train_ffhq.py:368-379):
            # convert g/d/g_ema in place of the msgpack path; optimizer
            # states keep the template's (torch Adam moments don't map).
            from diagan_tpu.utils import torch_import as ti

            size = 2 ** ((self.n_latent + 2) // 2)
            conv = ti.import_stylegan2_checkpoint(path, size)
            payload = dict(template)
            for k in ("g", "d", "g_ema"):
                src = conv.get(k, conv.get("g" if k == "g_ema" else k))
                payload[k] = serialization.from_state_dict(template[k], src)
            payload["ada_aug_p"] = conv.get("ada_aug_p", 0.0)
            try:
                payload["step"] = int(Path(path).stem)
            except ValueError:
                pass
            if self.d_drs_state is not None:
                payload["drs_d"] = serialization.from_state_dict(
                    jax.device_get(self.d_drs_state.params),
                    conv.get("drs_d", conv["d"]),
                )
        else:
            # per-key restore against the raw msgpack dict so every
            # optional key degrades independently: drs_d falls back to d
            # (phase-1 checkpoint, reference train_ffhq_phase2.py:605-610),
            # pl_mean to 0 (pre-round-3 checkpoints didn't carry it)
            raw = serialization.msgpack_restore(bytearray(data))
            payload = {
                k: serialization.from_state_dict(template[k], raw[k])
                for k in template if k in raw
            }
            payload["step"] = raw.get("step", 0)
            payload["ada_aug_p"] = raw.get("ada_aug_p", 0.0)
            payload["pl_mean"] = raw.get("pl_mean", 0.0)
            if self.d_drs_state is not None:
                drs_tmpl = jax.device_get(self.d_drs_state.params)
                payload["drs_d"] = serialization.from_state_dict(
                    drs_tmpl, raw.get("drs_d", raw["d"]))
                if "drs_d_optim" in raw:
                    payload["drs_d_optim"] = serialization.from_state_dict(
                        jax.device_get(self.d_drs_state.opt_state),
                        raw["drs_d_optim"])
        self.g_state = self.g_state.replace(params=jax.tree.map(
            jnp.asarray, payload["g"]))
        self.d_state = self.d_state.replace(params=jax.tree.map(
            jnp.asarray, payload["d"]))
        # Adam moments MUST come back too (the reference restores
        # g_optim/d_optim, train_ffhq.py:560-566): resuming with zeroed
        # moments is an effective-LR shock that knocked a long 256px run
        # into a degenerate equilibrium (observed on hardware, round 3).
        # The torch-import path above deliberately keeps fresh moments
        # (torch Adam state does not map to optax trees, MIGRATION.md).
        self.g_state = self.g_state.replace(opt_state=jax.tree.map(
            jnp.asarray, payload["g_optim"]))
        self.d_state = self.d_state.replace(opt_state=jax.tree.map(
            jnp.asarray, payload["d_optim"]))
        self.g_ema = jax.tree.map(jnp.asarray, payload["g_ema"])
        self.pl_mean = jnp.asarray(float(payload.get("pl_mean", 0.0)))
        if self.d_drs_state is not None:
            src = payload.get("drs_d", payload["d"])
            self.d_drs_state = self.d_drs_state.replace(
                params=jax.tree.map(jnp.asarray, src))
            if "drs_d_optim" in payload:
                self.d_drs_state = self.d_drs_state.replace(
                    opt_state=jax.tree.map(jnp.asarray,
                                           payload["drs_d_optim"]))
        self.ada_aug_p = float(payload.get("ada_aug_p", 0.0))
        if self.ada is not None:
            # sync the adaptive controller — it returns ITS internal p at
            # the first tune(), so leaving it at the fresh-construction 0.0
            # would silently collapse augmentation strength on every
            # preemption/restart of a long --auto_resume run
            self.ada.ada_aug_p = self.ada_aug_p
        return int(payload.get("step", 0))

    # dispatch-envelope auto-sizing: the platform kills device programs
    # that run much past ~a minute (docs/VALIDATION.md round 3), so every
    # fused dispatch must stay well under that. TARGET_DISPATCH_S is the
    # budget a dispatch is sized to; a dispatch observed past
    # SHRINK_GUARD_S forces the cap down even if the estimate said
    # otherwise. The per-step RNG is absolute-step-keyed, so re-chunking
    # never changes the result stream.
    TARGET_DISPATCH_S = 30.0
    SHRINK_GUARD_S = 45.0
    _CAP_LADDER = (8, 25, 50, 100)

    def _observe_chunk(self, n, dt, first_call):
        """Feed one fused-dispatch wall time into the envelope estimate.
        first_call dispatches are skipped entirely: their wall time is
        dominated by compilation, which is host/compile-service-side and
        says nothing about device-program length."""
        if self.max_chunk is not None or first_call:
            return
        t_step = dt / max(n, 1)
        fit = [c for c in self._CAP_LADDER
               if c * t_step <= self.TARGET_DISPATCH_S]
        cap = fit[-1] if fit else max(
            1, int(self.TARGET_DISPATCH_S / max(t_step, 1e-9)))
        if dt > self.SHRINK_GUARD_S:
            # realized dispatch ran long — clamp below the observed rate
            cap = min(cap, max(1, n // 2))
        prev = self._chunk_cap
        # only shrink after the cap has grown once: oscillating caps
        # would compile a new program per distinct n
        if prev is None or cap < prev or prev == self._BOOT_CHUNK:
            self._chunk_cap = cap

    _BOOT_CHUNK = 8  # conservative cap until a timed dispatch exists

    def _next_boundary(self, step):
        periods = [self.log_every, self.save_every]
        if self.logit_save_steps:
            periods.append(self.logit_save_steps)
        nxt = self.num_steps
        for p_ in periods:
            nxt = min(nxt, (step // p_ + 1) * p_)
        # dispatch-length cap: explicit --max_chunk wins; otherwise the
        # auto-sized cap (bootstrap _BOOT_CHUNK until the first timed
        # dispatch calibrates it in _observe_chunk). Unfused mode
        # dispatches per step pieces and needs no envelope.
        cap = self.max_chunk
        if cap is None and self.fuse:
            cap = self._chunk_cap if self._chunk_cap else self._BOOT_CHUNK
        if cap:
            nxt = min(nxt, (step // cap + 1) * cap)
        return nxt

    def train(self, start_step=0):
        """Host loop: everything between logging/checkpoint boundaries —
        plain updates AND the lazy regularizers at their exact reference
        cadence/order — runs as one scanned dispatch.

        SIGTERM (TPU preemption) and KeyboardInterrupt both stop at the
        next chunk boundary and flush a resumable checkpoint; the
        reference's stylegan2 loop has no such handling (train.py keeps
        no interrupt path), so this is a TPU-native hardening addition
        matching LogTrainer's (trainer.py here; reference
        trainer.py:353-357 only catches KeyboardInterrupt)."""
        step = start_step
        interrupted = {"flag": False}

        def _on_sigterm(signum, frame):
            interrupted["flag"] = True

        old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        try:
            self._train_loop(step, interrupted)
        except KeyboardInterrupt:
            print("INFO: Saving checkpoints from keyboard interrupt...",
                  flush=True)
            self._save_ckpt(self._loop_step)
        finally:
            signal.signal(signal.SIGTERM, old_handler)
        return self

    def _train_loop(self, step, interrupted):
        self._loop_step = step
        while step < self.num_steps and not interrupted["flag"]:
            # per-step keying (fold_in(self.key, absolute_step) inside the
            # chunk body): a resumed run — or one with DIFFERENT dispatch
            # chunking — re-derives the exact key stream of an
            # uninterrupted one, so resume stays bitwise-deterministic and
            # the dispatch envelope is free to auto-size
            n = self._next_boundary(step) - step
            if not self.fuse:
                ms = self._run_unfused(self.key, step, n)
                step += n
                self._loop_step = step
                signs = np.asarray(ms["sign_real"])
                if self.ada is not None:
                    for v in signs:
                        self.ada_aug_p = self.ada.tune(float(v),
                                                       self.batch_size)
                metrics = self._chunk_metrics(ms)
                self._after_chunk(step, metrics)
                continue
            chunk_key = (n, self._aug_live())
            first_call = chunk_key not in self._plain_chunks
            chunk = self._chunk_for(n)
            if self.stream:
                step_xs, r1_xs = self._host_stacks(step, n)
                t0 = time.perf_counter()
                (self.g_state, self.d_state, self.d_drs_state, self.g_ema,
                 self.pl_mean, ms) = chunk(
                    self.g_state, self.d_state, self.d_drs_state, self.g_ema,
                    self.pl_mean, self.key, self.ada_aug_p, jnp.int32(step),
                    step_xs, r1_xs,
                )
            else:
                t0 = time.perf_counter()
                (self.g_state, self.d_state, self.d_drs_state, self.g_ema,
                 self.pl_mean, ms) = chunk(
                    self.g_state, self.d_state, self.d_drs_state, self.g_ema,
                    self.pl_mean, self.key, self.ada_aug_p, jnp.int32(step),
                    self.images,
                )
            signs = np.asarray(ms["sign_real"])  # forces device sync
            self._observe_chunk(n, time.perf_counter() - t0, first_call)
            if self.ada is not None:
                for v in signs:
                    # sign_real is psum'd across the mesh, so the paired
                    # count is the GLOBAL batch (reference all-reduces both,
                    # non_leaking.py:20-43)
                    self.ada_aug_p = self.ada.tune(
                        float(v), self.batch_size * self._mesh_n)
            metrics = self._chunk_metrics(ms)
            step += n
            self._loop_step = step
            self._after_chunk(step, metrics)
        if interrupted["flag"] and step < self.num_steps:
            print(f"INFO: SIGTERM — flushing checkpoint at step {step}",
                  flush=True)
            self._save_ckpt(step)
        else:
            self._save_ckpt(self.num_steps)

    def _chunk_metrics(self, ms):
        """Printable scalars from a chunk's stacked metrics: last step's
        value, except the lazy regularizers (r1/path), which are zero on
        non-reg steps — for those, report the last REG step's value inside
        the chunk (the chunk boundary is never itself a reg step when
        log_every isn't a multiple of d_reg_every, so taking [-1] printed a
        misleading constant 0)."""
        out = {}
        for k, v in ms.items():
            if k == "sign_real":
                continue
            arr = np.asarray(v)
            if k in ("r1", "path"):
                nz = arr[arr != 0.0]
                out[k] = float(nz[-1]) if nz.size else 0.0
            else:
                out[k] = float(arr[-1])
        return out

    def _after_chunk(self, step, metrics):
        if step % self.log_every == 0:
            parts = "; ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
            print(f"step {step}: {parts}; ada_p: {self.ada_aug_p:.4f}",
                  flush=True)
        if (
            self.logit_save_steps
            and step % self.logit_save_steps == 0
            and self.save_logit_after <= step <= self.stop_save_logit_after
            and step < self.num_steps
        ):
            self._record_logits(step)
        if step % self.save_every == 0 and step < self.num_steps:
            self._save_ckpt(step)
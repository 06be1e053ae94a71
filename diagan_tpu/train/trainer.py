"""LogTrainer — the reference's central training loop, rebuilt TPU-first.

Behavioral parity with reference diagan-pkg/diagan/trainer/trainer.py:
  - n_dis D updates per G update; DRS discriminator trained in lock-step on
    its own unweighted stream (trainer.py:250-291),
  - linear LR decay to zero over num_steps (scheduler.py:40-78),
  - per-example logit recording every `logit_save_steps` inside
    [save_logit_after, stop_save_logit_after] — phase 2 records netD_drs
    (trainer.py:328-340); pickles `logits_{name}_{mode}.pkl` at each
    checkpoint (trainer.py:138-140,342-346),
  - checkpoints every save_steps under checkpoints/{netG,netD,netD_drs}/
    with `{name}_{step}_steps.pth` filenames (trainer.py:188-204),
  - GOLD activation at gold_step, top-k decay per epoch, same scalar names.

TPU-native differences: the hot loop runs in jitted chunks (lax.scan of
fused steps — steps.py) with on-device weighted sampling, so the host only
wakes at logging/recording/checkpoint boundaries; KeyboardInterrupt and
SIGTERM (TPU preemption) both flush checkpoints + logit pickles.
"""
from __future__ import annotations

import signal
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.data.pipeline import DeviceDataSource
from diagan_tpu.data.sampler import log_weights_from_scores
from diagan_tpu.train import checkpoint as ckpt
from diagan_tpu.train.logger import Logger
from diagan_tpu.train.logit_recorder import LogitRecorder
from diagan_tpu.train.state import create_net_state, linear_decay_schedule, NetState
from diagan_tpu.train.steps import StepConfig, make_fused_step, make_train_chunk

import optax


def _make_tx(lr, betas, num_steps, decay, updates_per_step=1):
    """Adam whose schedule is driven by *global* step parity: the reference
    decays all optimizers by global_step (scheduler.py:80-106), while optax
    counts update() calls — D updates n_dis times per global step, so the
    schedule divides the count back."""
    if decay == "linear" and num_steps:
        base = linear_decay_schedule(lr, num_steps)
        sched = lambda count: base(count / updates_per_step)  # noqa: E731
    else:
        sched = lr
    return optax.adam(sched, b1=betas[0], b2=betas[1], eps=1e-8)


class LogTrainer:
    def __init__(
        self,
        output_path,
        bundle,
        dataset,
        num_steps,
        sample_weights=None,
        dataset_drs=None,
        log_dir=None,
        n_dis=1,
        lr_decay=None,
        batch_size=64,
        netG_ckpt_file=None,
        netD_ckpt_file=None,
        netD_drs_ckpt_file=None,
        print_steps=10,
        vis_steps=500,
        log_steps=50,
        save_steps=5000,
        logit_save_steps=500,
        save_logits=True,
        topk=False,
        gold=False,
        gold_step=None,
        save_logit_after=0,
        stop_save_logit_after=100000,
        save_eval_logits=True,
        seed=0,
        weight_eps=1e-6,
        profile_dir=None,
        step_fusions=None,
        mesh=None,
        fold_sweep=True,
    ):
        # fold_sweep: run each in-window logit sweep INSIDE the train-chunk
        # program (one dispatch, no host sync at the window boundary) —
        # values bit-identical to the standalone recorder (pinned by
        # tests/test_train.py); False keeps the separate-dispatch path.
        # The reference synced host<->device per BATCH here
        # (trainer.py:142-156).
        self.fold_sweep = fold_sweep
        # step_fusions: optional dict of StepConfig probe knobs
        # ({'concat_d', 'fuse_g', 'simultaneous_g'} -> bool); all default
        # False = exact reference step semantics (see steps.StepConfig)
        self.step_fusions = dict(step_fusions or {})
        # mesh: optional jax.sharding.Mesh for data parallelism — the
        # DDP/NCCL replacement (reference stylegan2/train_ffhq.py:572-585,
        # here available to EVERY trainer, not just StyleGAN2). batch_size
        # stays the GLOBAL batch; each device trains batch_size/n_dev with
        # its own index/latent stream and pmean'd grads, so weighted
        # resampling composes with sharding (fixing the reference bug where
        # DistributedSampler dropped the score weights,
        # train_ffhq_phase2.py:35-45).
        self.mesh = mesh
        self.n_devices = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
        if batch_size % self.n_devices:
            raise ValueError(
                f"batch_size {batch_size} must divide evenly over the "
                f"{self.n_devices}-device mesh"
            )
        # jax.profiler trace over the first chunks when requested
        self.profile_dir = profile_dir
        self.output_path = Path(output_path)
        self.log_dir = Path(log_dir or output_path)
        self.bundle = bundle
        self.num_steps = num_steps
        self.n_dis = n_dis
        self.batch_size = batch_size
        self.print_steps = print_steps
        self.vis_steps = vis_steps
        self.log_steps = log_steps
        self.save_steps = save_steps
        self.logit_save_steps = logit_save_steps
        self.save_logits = save_logits
        self.save_logit_after = save_logit_after
        self.stop_save_logit_after = stop_save_logit_after
        self.save_eval_logits = save_eval_logits
        self.gold = gold
        self.gold_step = gold_step if gold_step is not None else 0
        self.topk = topk
        self.train_drs = bundle.disc_drs is not None
        self.seed = seed
        self.key = jax.random.key(seed)

        # ---- data (device-resident; replicated over the mesh) -----------
        data_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            data_sharding = NamedSharding(mesh, PartitionSpec())
        self.source = DeviceDataSource(
            dataset, weights=sample_weights, sharding=data_sharding,
            eps=weight_eps,
        )
        self.source_drs = (
            DeviceDataSource(dataset_drs or dataset, sharding=data_sharding)
            if self.train_drs else None
        )
        if mesh is not None and self.source.log_weights is not None:
            self.source.log_weights = jax.device_put(
                self.source.log_weights, data_sharding
            )
        self.num_data = len(dataset)
        self.epoch_steps = max(1, self.num_data // batch_size)

        # ---- optimizers (global-step schedule parity) -------------------
        self.tx_g = _make_tx(bundle.opt_g.lr, bundle.opt_g.betas, num_steps,
                             lr_decay, 1)
        self.tx_d = _make_tx(bundle.opt_d.lr, bundle.opt_d.betas, num_steps,
                             lr_decay, n_dis)
        self.tx_d_drs = (
            _make_tx(bundle.opt_d_drs.lr, bundle.opt_d_drs.betas, num_steps,
                     lr_decay, n_dis)
            if self.train_drs else None
        )
        # reference scalar names: lr_{idx} per optimizer in the order
        # [optD, optD_drs?, optG] (trainer.py:121, scheduler.py:104)
        def _sched(lr0):
            return (linear_decay_schedule(lr0, num_steps)
                    if lr_decay == "linear" else (lambda s: lr0))

        init_lrs = [bundle.opt_d.lr]
        if self.train_drs:
            init_lrs.append(bundle.opt_d_drs.lr)
        init_lrs.append(bundle.opt_g.lr)
        self._lr_scheds = [(f"lr_{i}", _sched(lr)) for i, lr in enumerate(init_lrs)]

        # ---- init states -------------------------------------------------
        k_g, k_d, k_dd, k_drop = jax.random.split(self.key, 4)
        z0 = jnp.zeros((2, bundle.nz))
        if bundle.dataset == "25gaussian":
            x0 = jnp.zeros((2, 2))
        else:
            x0 = jnp.zeros((2, bundle.image_size, bundle.image_size, bundle.nc))
        self.g_state = create_net_state(
            bundle.gen, {"params": k_g}, (z0,), self.tx_g, train=True
        )
        self.d_state = create_net_state(
            bundle.disc, {"params": k_d, "dropout": k_drop}, (x0,), self.tx_d
        )
        self.d_drs_state = (
            create_net_state(
                bundle.disc_drs, {"params": k_dd, "dropout": k_drop}, (x0,),
                self.tx_d_drs,
            )
            if self.train_drs else None
        )

        # ---- restore (phase-2: G/D from phase-1, D_drs from netD ckpt) --
        self.global_step = 0
        if netG_ckpt_file:
            self.g_state = ckpt.restore_net(self.g_state, netG_ckpt_file)
            self.global_step = max(self.global_step, int(self.g_state.step))
        if netD_ckpt_file:
            self.d_state = ckpt.restore_net(self.d_state, netD_ckpt_file)
            self.global_step = max(
                self.global_step, int(self.d_state.step) // max(1, n_dis)
            )
        if netD_drs_ckpt_file and self.train_drs:
            # clone of netD's phase-1 weights (train_mimicry_phase2.py:98-101)
            self.d_drs_state = ckpt.restore_net(self.d_drs_state, netD_drs_ckpt_file)

        if mesh is not None:
            from diagan_tpu.parallel import replicate

            self.g_state = replicate(self.g_state, mesh)
            self.d_state = replicate(self.d_state, mesh)
            if self.train_drs:
                self.d_drs_state = replicate(self.d_drs_state, mesh)

        # ---- fused step + chunk -----------------------------------------
        cfg = StepConfig(
            n_dis=n_dis,
            batch_size=batch_size // self.n_devices,
            nz=bundle.nz,
            loss_type=bundle.loss_type,
            drs_loss_type=bundle.drs_loss_type,
            model=bundle.model,
            gold=gold,
            gold_step=self.gold_step,
            topk=topk,
            epoch_steps=self.epoch_steps,
            use_drs=self.train_drs,
            quantized=self.source._quantized,
            axis_name="data" if mesh is not None else None,
            **self.step_fusions,
        )
        self.cfg = cfg
        self._make_fused_step = lambda g_aux_loss=None: make_fused_step(
            bundle.gen, bundle.disc, bundle.disc_drs,
            self.tx_g, self.tx_d, self.tx_d_drs, cfg,
            self.num_data, self.source_drs.num_data if self.train_drs else 1,
            g_aux_loss=g_aux_loss,
        )
        self.fused_step = self._make_fused_step()
        self._chunks = {}  # chunk_size -> jitted program
        self.aux = None    # extra pytree for g_aux_loss hooks (Inclusive GAN)
        self.g_aux_loss = None

        # ---- logit recorder ---------------------------------------------
        n_snaps = (
            (stop_save_logit_after - save_logit_after) // max(1, logit_save_steps)
            + 2
        )
        self.recorder = LogitRecorder(self.num_data, max(n_snaps, 2), mesh=mesh)
        self._record_fwd = None
        self._record_name = "{}_{}".format(
            "netD_drs" if self.train_drs else "netD",
            "eval" if save_eval_logits else "train",
        )
        if self.global_step and save_logits:
            self._maybe_restore_logit_buffer()
        self.logger = Logger(self.log_dir)

        # sample-grid latents fixed across training (mimicry-style)
        self._vis_z = jax.random.normal(jax.random.key(seed + 1), (64, bundle.nz))

    # ------------------------------------------------------------------
    def _chunk_fn(self, size):
        if size not in self._chunks:
            if self.mesh is not None:
                from diagan_tpu.parallel import make_sharded_train_chunk

                self._chunks[size] = make_sharded_train_chunk(
                    self.fused_step, size, self.mesh
                )
            else:
                self._chunks[size] = make_train_chunk(self.fused_step, size)
        return self._chunks[size]

    def _combined_chunk_fn(self, size):
        """Train chunk with the logit sweep folded into the SAME jitted
        program: after the scanned steps, the final D (or DRS-D) forwards
        the whole dataset and scatters the row into the ring buffer slot —
        one dispatch, nothing crosses the host boundary, and the chunk
        pipeline keeps flowing through the recording window (the separate
        sweep dispatch + forced sync used to halve in-window throughput,
        docs/VALIDATION.md)."""
        cache_key = (size, "sweep")
        if cache_key not in self._chunks:
            row_fn = self.recorder.make_row_fn(
                self._get_record_fwd(), self.source._quantized
            )
            if self.mesh is not None:
                from diagan_tpu.parallel import make_sharded_train_chunk

                inner = make_sharded_train_chunk(
                    self.fused_step, size, self.mesh, donate=False
                )
            else:
                inner = make_train_chunk(self.fused_step, size, donate=False)
            use_drs = self.train_drs

            def combined(g, d, ddrs, images, drs_images, log_weights, key,
                         start_step, buffer, slot, sweep_key, aux=None):
                g, d, ddrs, metrics = inner(
                    g, d, ddrs, images, drs_images, log_weights, key,
                    start_step, aux,
                )
                ds = ddrs if use_drs else d
                row = row_fn(ds.params, ds.state, images, sweep_key)
                return g, d, ddrs, metrics, buffer.at[slot].set(row)

            self._chunks[cache_key] = jax.jit(
                combined, donate_argnums=(0, 1, 2, 8)
            )
        return self._chunks[cache_key]

    def _next_boundary(self, step):
        # log_steps deliberately NOT a boundary: the chunk returns stacked
        # per-step metrics, so interior log-step scalars are written from
        # the stack after the chunk — identical values, fewer host syncs
        # (each chunk-end sync stalls the dispatch pipeline ~0.8s on this
        # platform).
        nxt = self.num_steps
        for period in (self.print_steps, self.vis_steps,
                       self.save_steps, self.logit_save_steps):
            nxt = min(nxt, (step // period + 1) * period)
        return nxt

    def _logit_window(self, step):
        return (
            self.save_logits
            and step % self.logit_save_steps == 0
            and self.save_logit_after <= step <= self.stop_save_logit_after
        )

    def _get_record_fwd(self):
        """The D forward used for logit sweeps (shared by the standalone
        recorder dispatch and the folded-into-chunk sweep)."""
        if self.train_drs:
            name, dmod = "netD_drs", self.bundle.disc_drs
        else:
            name, dmod = "netD", self.bundle.disc
        mode = "eval" if self.save_eval_logits else "train"
        if self._record_fwd is None:

            def fwd(params, state, batch, rng):
                if mode == "train" and state:
                    # train-mode sweep: BN uses batch statistics and dropout
                    # is live (fresh per-batch rng); collection updates are
                    # computed then discarded (the reference's no_grad
                    # train-mode forward, trainer.py:147)
                    out, _ = dmod.apply(
                        {"params": params, **state}, batch,
                        update_stats=False, train=True,
                        mutable=list(state.keys()), rngs={"dropout": rng},
                    )
                else:
                    out = dmod.apply(
                        {"params": params, **state}, batch,
                        update_stats=False, train=False,
                        rngs={"dropout": rng},
                    )
                return out, state

            self._record_fwd = fwd
            self._record_name = f"{name}_{mode}"
        return self._record_fwd

    def _sweep_key(self, step):
        return jax.random.fold_in(jax.random.key(self.seed + 2), step)

    def _record_logits(self, step):
        fwd = self._get_record_fwd()
        d_state = self.d_drs_state if self.train_drs else self.d_state
        self.recorder.record(
            fwd, d_state.params, d_state.state,
            self.source.images, step, quantized=self.source._quantized,
            key=self._sweep_key(step),
        )

    def _save_checkpoints(self, step):
        ckpt.save_net(self.g_state, self.log_dir / "checkpoints", "netG", step)
        ckpt.save_net(self.d_state, self.log_dir / "checkpoints", "netD", step)
        if self.train_drs:
            ckpt.save_net(
                self.d_drs_state, self.log_dir / "checkpoints", "netD_drs", step
            )
        # the logit ring buffer rides along so a mid-window preemption
        # restart loses no recorded snapshots
        if self.save_logits and self.recorder.count:
            sd = self.recorder.state_dict()
            np.savez(
                self.log_dir / "checkpoints" / "logit_buffer.npz",
                buffer=sd["buffer"], steps=sd["steps"], count=sd["count"],
            )

    def _maybe_restore_logit_buffer(self):
        path = self.log_dir / "checkpoints" / "logit_buffer.npz"
        if path.is_file():
            with np.load(path) as f:
                self.recorder.load_state_dict(
                    {"buffer": f["buffer"], "steps": f["steps"],
                     "count": int(f["count"])}
                )
            print(f"INFO: restored {self.recorder.count} logit snapshots")

    def _save_logit_pickles(self):
        if self.recorder.count:
            self.recorder.save(
                self.output_path / f"logits_{self._record_name}.pkl"
            )

    def generate_images(self, z=None, n=64):
        z = self._vis_z[:n] if z is None else z
        return self.bundle.gen.apply(
            {"params": self.g_state.params, **self.g_state.state}, z, train=False
        )

    # ------------------------------------------------------------------
    def train(self):
        step = self.global_step
        print(f"INFO: Starting training from global step {step}...")
        log_weights = self.source.log_weights
        drs_images = (
            self.source_drs.images if self.train_drs else self.source.images
        )

        interrupted = {"flag": False}

        def _on_sigterm(signum, frame):  # TPU preemption -> flush state
            interrupted["flag"] = True

        old_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        start_time = time.time()
        profiling = False
        if self.profile_dir:
            jax.profiler.start_trace(str(self.profile_dir))
            profiling = True
            profile_until = step + 3 * self.print_steps
        pending = None  # (chunk_start, chunk_end, device-side metric stack)

        def process_pending(p):
            # Host-side logging for a finished chunk — called AFTER the
            # next chunk has been dispatched, so the metric transfer + IO
            # overlap device compute (software pipelining over the ~0.8s
            # per-dispatch stall on this platform). Values are identical
            # to eager logging.
            nonlocal start_time
            if p is None:
                return
            chunk_start, chunk_end, metrics = p
            stacked = {k: np.asarray(v) for k, v in metrics.items()}
            first_log = (chunk_start // self.log_steps + 1) * self.log_steps
            for ls in range(first_log, chunk_end + 1, self.log_steps):
                row = {k: float(v[ls - chunk_start - 1])
                       for k, v in stacked.items()}
                for name, sched in self._lr_scheds:
                    row[name] = float(sched(ls))
                self.logger.write_scalars(ls, row)
            if chunk_end % self.print_steps == 0:
                last = {k: float(v[-1]) for k, v in stacked.items()}
                for name, sched in self._lr_scheds:
                    last[name] = float(sched(chunk_end))
                now = time.time()
                self.logger.print_log(
                    chunk_end, self.num_steps, last,
                    (now - start_time) / max(1, chunk_end - chunk_start),
                )
                start_time = now

        try:
            while step < self.num_steps and not interrupted["flag"]:
                boundary = self._next_boundary(step)
                size = boundary - step
                key = jax.random.fold_in(self.key, step)
                folded_sweep = (
                    self.fold_sweep and self._logit_window(boundary)
                    and self.recorder.count < self.recorder.max_snapshots
                )
                if folded_sweep:
                    chunk = self._combined_chunk_fn(size)
                    (self.g_state, self.d_state, self.d_drs_state, metrics,
                     buffer) = chunk(
                        self.g_state, self.d_state, self.d_drs_state,
                        self.source.images, drs_images, log_weights, key,
                        jnp.asarray(step, jnp.int32), self.recorder.buffer,
                        jnp.asarray(self.recorder.count, jnp.int32),
                        self._sweep_key(boundary), self.aux,
                    )
                    self.recorder.commit_row(buffer, boundary)
                    if self.recorder.count == 1:
                        print("INFO: logit sweeps folded into the train "
                              "chunk (no extra dispatch per window step)")
                else:
                    chunk = self._chunk_fn(size)
                    (self.g_state, self.d_state, self.d_drs_state,
                     metrics) = chunk(
                        self.g_state, self.d_state, self.d_drs_state,
                        self.source.images, drs_images, log_weights, key,
                        jnp.asarray(step, jnp.int32), self.aux,
                    )
                prev, pending = pending, (step, boundary, metrics)
                step = boundary
                if profiling and step >= profile_until:
                    jax.profiler.stop_trace()
                    profiling = False
                    print(f"INFO: profiler trace written to {self.profile_dir}")
                # log the PREVIOUS chunk while this one runs on device
                process_pending(prev)
                if (step % self.vis_steps == 0 or step % self.save_steps == 0
                        or (self._logit_window(step) and not folded_sweep)
                        or step >= self.num_steps):
                    # boundary actions below synchronize on the new states
                    # anyway — flush this chunk's logs first, in order
                    process_pending(pending)
                    pending = None
                if step % self.vis_steps == 0:
                    if self.bundle.image_size:
                        self.logger.vis_images(step, self.generate_images())
                    elif self.bundle.dataset == "25gaussian":
                        # scatter diagnostic (reference trainer.py:318-322)
                        from diagan_tpu.utils.plot import plot_gaussian_samples

                        z = jax.random.normal(
                            jax.random.fold_in(self.key, 10**6 + step),
                            (1000, self.bundle.nz),
                        )
                        plot_gaussian_samples(
                            np.asarray(self.generate_images(z=z)),
                            self.log_dir / "images", step,
                            real_points=self.source.dataset.images[:1000],
                        )
                if self._logit_window(step) and not folded_sweep:
                    print(f"INFO: logit saving at step {step}...")
                    self._record_logits(step)
                if step % self.save_steps == 0:
                    print("INFO: Saving checkpoints...")
                    self._save_checkpoints(step)
                    if self.save_logits and step >= self.save_logit_after:
                        self._save_logit_pickles()

            process_pending(pending)
            pending = None
            print("INFO: Saving final checkpoints...")
            self._save_checkpoints(step)
            if self.save_logits and step >= self.save_logit_after:
                self._save_logit_pickles()
        except KeyboardInterrupt:
            print("INFO: Saving checkpoints from keyboard interrupt...")
            self._save_checkpoints(step)
            if self.save_logits and step >= self.save_logit_after:
                self._save_logit_pickles()
        finally:
            if profiling:
                jax.profiler.stop_trace()
            signal.signal(signal.SIGTERM, old_handler)
            self.logger.close()
        self.global_step = step
        print("INFO: Training Ended.")
        return self

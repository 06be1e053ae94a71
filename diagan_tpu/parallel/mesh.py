"""Device-mesh data parallelism — the reference's distributed layer, redone.

One module replaces everything in reference stylegan2/distributed.py (rank
guards, reduce_sum, pickle all_gather, reduce_loss_dict) and the
DDP/NCCL/DistributedSampler plumbing (train_ffhq.py:500-585): a 1-D
`jax.sharding.Mesh` over ICI, `shard_map` around the fused train step with
`lax.pmean` gradient reduction (steps.py), per-device index/latent streams
via key folding, and `lax.all_gather` for the distributed logit recorder
(replacing concat_all_gather, train_ffhq.py:128-161).

Parallelism scope note (SURVEY.md §2.10): the workload is <=30M-parameter
convolutional GANs — data parallelism is the only applicable axis; params,
optimizer state, and the uint8 dataset are replicated per device, batches
and latent draws are sharded. TP/PP/SP/EP have no surface here by design.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "data"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_sharded_train_chunk(fused_step, chunk_size: int, mesh: Mesh,
                             axis: str = AXIS, donate=True):
    """shard_map'd variant of train.steps.make_train_chunk.

    Per-device semantics: each device runs the fused step with the
    *per-device* batch size baked into its StepConfig and a device-unique
    key stream; `lax.pmean` inside the step reduces gradients so all
    replicas stay bit-identical. States and images are replicated; metrics
    come back replicated (any replica's copy is authoritative).
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
        # metric parity with the reference's reduce_loss_dict (rank-0 mean,
        # stylegan2/distributed.py:104-126): losses are device-local (each
        # replica saw its own batch shard), so average them over the mesh
        metrics = jax.lax.pmean(metrics, axis)
        # Mutable collections (BatchNorm running stats) integrate
        # device-local batches and DIVERGE across replicas; out_specs=P()
        # below asserts replication, and the logit sweep / eval forwards
        # read these stats, so resync them once per chunk. Params stay
        # bitwise-replicated through pmean'd grads and need nothing;
        # spectral-norm u vectors are functions of replicated params, so
        # the pmean is an identity for them. (The reference's DDP never
        # syncs BN stats and silently checkpoints rank-0's — this is the
        # deterministic fix, restoring bitwise resume under a mesh.)
        def sync_state(s):
            return s.replace(state=jax.lax.pmean(s.state, axis)) \
                if s is not None else None

        g_state = sync_state(g_state)
        d_state = sync_state(d_state)
        d_drs_state = sync_state(d_drs_state)
        return g_state, d_state, d_drs_state, metrics

    repl = P()
    sharded = shard_map(
        chunk,
        mesh=mesh,
        in_specs=(repl,) * 9,
        out_specs=(repl, repl, repl, repl),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2) if donate else ())


def shard_logit_gather(values, indices, axis: str = AXIS):
    """All-gather (value, index) pairs across the mesh — the TPU equivalent
    of the reference's distributed logit recording concat_all_gather
    (train_ffhq.py:150-161). Call inside shard_map."""
    v = jax.lax.all_gather(values, axis, tiled=True)
    i = jax.lax.all_gather(indices, axis, tiled=True)
    return v, i


def per_host_shard(array: np.ndarray, process_index=None, num_processes=None):
    """Contiguous per-host slice of a host-side array (multi-host data
    sharding; single-host returns the array unchanged)."""
    pi = jax.process_index() if process_index is None else process_index
    npr = jax.process_count() if num_processes is None else num_processes
    if npr == 1:
        return array
    n = len(array)
    lo = pi * n // npr
    hi = (pi + 1) * n // npr
    return array[lo:hi]

"""Two-process fake-cluster worker (spawned by test_multihost.py).

Exercises the MULTI-HOST path of diagan_tpu.parallel on one machine:
`jax.distributed.initialize` + Gloo CPU collectives, 2 processes x 4
virtual devices = one 8-device global mesh running the real fused train
chunk with cross-process pmean gradient reduction. This is the rebuild's
stand-in for the reference's multi-node NCCL/DDP setup
(stylegan2/train_ffhq.py:500-585), which the reference itself never tested
without a cluster (SURVEY.md §4).

Writes `<outdir>/params_<pid>.txt` (checksum of trained G params) and
`<outdir>/ok_<pid>` on success; the test asserts both processes agree.
"""
import os
import sys

port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import shard_map  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from diagan_tpu.models import get_gan_model  # noqa: E402
from diagan_tpu.parallel import (  # noqa: E402
    AXIS,
    make_mesh,
    make_sharded_train_chunk,
    per_host_shard,
    replicate,
    shard_logit_gather,
)
from diagan_tpu.train.state import create_net_state  # noqa: E402
from diagan_tpu.train.steps import StepConfig, make_fused_step  # noqa: E402
from diagan_tpu.train.trainer import _make_tx  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4
mesh = make_mesh()

# --- collective-level check: logit gather covers every device ------------
def gather_ids(_):
    dev = jax.lax.axis_index(AXIS)
    vals, idxs = shard_logit_gather(
        jnp.ones((2,)) * dev, jnp.arange(2, dtype=jnp.int32) + 2 * dev
    )
    return vals, idxs

vals, idxs = jax.jit(shard_map(
    gather_ids, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
    check_vma=False,
))(jnp.zeros(()))
assert sorted(np.asarray(idxs).tolist()) == list(range(16))
assert sorted(set(np.asarray(vals).tolist())) == list(map(float, range(8)))

# --- host-side data sharding ---------------------------------------------
data = np.random.default_rng(0).normal(size=(256, 2)).astype(np.float32)
shard = per_host_shard(data)
np.testing.assert_array_equal(shard, data[pid * 128:(pid + 1) * 128])

# --- the real fused train chunk over the global mesh ---------------------
bundle = get_gan_model("25gaussian", loss_type="ns")
tx = _make_tx(1e-4, (0.5, 0.999), 100, None, 1)
cfg = StepConfig(
    n_dis=1, batch_size=4, nz=bundle.nz, loss_type="ns", drs_loss_type="ns",
    model="toy", gold=False, gold_step=0, topk=False, epoch_steps=8,
    use_drs=False, quantized=False, axis_name=AXIS,
)
k = jax.random.key(0)
g_state = create_net_state(bundle.gen, {"params": k},
                           (jnp.zeros((2, bundle.nz)),), tx, train=True)
d_state = create_net_state(bundle.disc, {"params": k, "dropout": k},
                           (jnp.zeros((2, 2)),), tx)
fused = make_fused_step(bundle.gen, bundle.disc, None, tx, tx, None, cfg,
                        len(data), 1)
chunk = make_sharded_train_chunk(fused, 3, mesh, donate=False)
g, d, _, metrics = chunk(
    replicate(g_state, mesh), replicate(d_state, mesh), None,
    replicate(jnp.asarray(data), mesh), replicate(jnp.asarray(data), mesh),
    None, jax.random.key(1), jnp.int32(0), None,
)
errs = np.asarray(metrics["errD"])
assert errs.shape == (3,) and np.isfinite(errs).all(), errs
checksum = float(sum(jnp.sum(jnp.abs(l)) for l in jax.tree.leaves(g.params)))
assert np.isfinite(checksum)

with open(os.path.join(outdir, f"params_{pid}.txt"), "w") as f:
    f.write(f"{checksum:.9e}\n")
with open(os.path.join(outdir, f"ok_{pid}"), "w") as f:
    f.write("ok\n")
print(f"proc {pid}: multihost chunk ok, checksum {checksum:.6e}", flush=True)

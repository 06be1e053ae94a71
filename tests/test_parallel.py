"""Data-parallel mesh tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.data.pipeline import DeviceDataSource
from diagan_tpu.models import get_gan_model
from diagan_tpu.parallel import make_mesh, make_sharded_train_chunk, replicate
from diagan_tpu.train.state import create_net_state
from diagan_tpu.train.steps import StepConfig, make_fused_step
from diagan_tpu.train.trainer import _make_tx


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def _setup(tmp_path, mesh, per_device_bs=2):
    ds = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=64, seed=0
    )
    bundle = get_gan_model("color_mnist", loss_type="ns", drs=True)
    tx_g = _make_tx(1e-4, (0.5, 0.9), 100, "linear", 1)
    tx_d = _make_tx(1e-4, (0.5, 0.9), 100, "linear", 1)
    cfg = StepConfig(
        n_dis=1, batch_size=per_device_bs, nz=bundle.nz,
        loss_type="ns", drs_loss_type="ns", model="dcgan",
        gold=False, gold_step=0, topk=False, epoch_steps=8,
        use_drs=True, quantized=True, axis_name="data",
    )
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    x0 = jnp.zeros((2, 32, 32, 3))
    g_state = create_net_state(bundle.gen, {"params": k}, (z0,), tx_g, train=True)
    d_state = create_net_state(
        bundle.disc, {"params": k, "dropout": k}, (x0,), tx_d
    )
    dd_state = create_net_state(
        bundle.disc_drs, {"params": k, "dropout": k}, (x0,), tx_d
    )
    fused = make_fused_step(
        bundle.gen, bundle.disc, bundle.disc_drs, tx_g, tx_d, tx_d, cfg,
        len(ds), len(ds),
    )
    src = DeviceDataSource(ds)
    return g_state, d_state, dd_state, fused, src


@pytest.mark.slow
def test_sharded_chunk_runs_and_stays_replicated(tmp_path, mesh):
    g, d, dd, fused, src = _setup(tmp_path, mesh)
    chunk = make_sharded_train_chunk(fused, 2, mesh, donate=False)
    images = replicate(src.images, mesh)
    g, d, dd, metrics = chunk(
        replicate(g, mesh), replicate(d, mesh), replicate(dd, mesh),
        images, images, None, jax.random.key(1), jnp.int32(0), None,
    )
    assert metrics["errD"].shape == (2,)
    assert np.isfinite(np.asarray(metrics["errD"])).all()
    assert np.isfinite(np.asarray(metrics["errG"])).all()
    # params must remain identical across replicas (pmean'd grads), and so
    # must the mutable collections: BatchNorm running stats integrate
    # device-local batches and would silently diverge without the chunk-end
    # pmean resync (out_specs=P() asserts replication; the logit sweep and
    # checkpoint/resume read these stats)
    for net in (g, d, dd):
        for leaf in jax.tree.leaves(net.params)[:2] + jax.tree.leaves(net.state):
            per_dev = [np.asarray(s.data) for s in leaf.addressable_shards]
            assert len(per_dev) == 8
            for arr in per_dev[1:]:
                np.testing.assert_array_equal(arr, per_dev[0])


def test_sharded_logit_sweep_matches_single_device(tmp_path, mesh):
    from diagan_tpu.train.logit_recorder import LogitRecorder

    ds = get_predefined_dataset(
        "color_mnist", tmp_path, major_ratio=0.9, num_data=50, seed=0
    )
    bundle = get_gan_model("color_mnist", loss_type="ns")
    k = jax.random.key(3)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = bundle.disc.init(
        {"params": k, "dropout": k}, x0, update_stats=False, train=False
    )
    params = variables["params"]
    state = {c: v for c, v in variables.items() if c != "params"}

    def fwd(p, s, batch, rng):
        out = bundle.disc.apply(
            {"params": p, **s}, batch, update_stats=False, train=False,
            rngs={"dropout": rng},
        )
        return out, s

    src = DeviceDataSource(ds)
    # odd batch size -> ragged tail + mesh padding both exercised
    rec_single = LogitRecorder(len(ds), 2, batch_size=16)
    rec_shard = LogitRecorder(len(ds), 2, batch_size=16, mesh=mesh)
    for rec in (rec_single, rec_shard):
        rec.record(fwd, params, state, src.images, 7,
                   key=jax.random.key(9))
    single = rec_single.as_dict()[7]
    shard = rec_shard.as_dict()[7]
    np.testing.assert_array_equal(single, shard)


@pytest.mark.slow
def test_data_parallel_resume_is_bitwise_deterministic(tmp_path, mesh):
    """Mesh variant of the single-device resume-determinism pin: an 8-step
    straight data-parallel run and a 4-step run resumed from its step-4
    checkpoint end bit-identical. Regression for the BatchNorm running-stat
    divergence: without the chunk-end state pmean, the checkpoint captured
    device-0 stats while replicas held different ones, so a resumed run
    (all replicas re-seeded from the checkpoint) diverged from the
    uninterrupted one."""
    from diagan_tpu.train.trainer import LogTrainer

    ds = get_predefined_dataset(
        "color_mnist", tmp_path / "data", major_ratio=0.9, num_data=64, seed=0
    )

    def make(out, **kw):
        bundle = get_gan_model("color_mnist", loss_type="ns")
        return LogTrainer(
            output_path=out, bundle=bundle, dataset=ds, mesh=mesh,
            num_steps=8, n_dis=1, lr_decay="linear", batch_size=8,
            print_steps=4, vis_steps=8, log_steps=4, save_steps=4,
            save_logits=False, seed=0, **kw,
        )

    tr_a = make(tmp_path / "straight")
    tr_a.train()
    tr_c = make(
        tmp_path / "resumed",
        netG_ckpt_file=str(
            tmp_path / "straight/checkpoints/netG/netG_4_steps.pth"),
        netD_ckpt_file=str(
            tmp_path / "straight/checkpoints/netD/netD_4_steps.pth"),
    )
    assert tr_c.global_step == 4
    tr_c.train()
    for name, a, c in (("G", tr_a.g_state, tr_c.g_state),
                       ("D", tr_a.d_state, tr_c.d_state)):
        for pa, pc in zip(jax.tree.leaves((a.params, a.state)),
                          jax.tree.leaves((c.params, c.state))):
            np.testing.assert_array_equal(
                np.asarray(pa), np.asarray(pc),
                err_msg=f"{name} diverged after mesh resume")


@pytest.mark.slow
def test_data_parallel_cli_end_to_end(tmp_path, mesh, monkeypatch):
    """Drive the phase-1 Colored-MNIST CLI with --data_parallel: params must
    stay bit-identical across replicas and all artifacts must appear."""
    import pickle
    import sys

    from diagan_tpu.cli import mnist_scripts

    monkeypatch.setattr(sys, "argv", [
        "train_mimicry_color_mnist_phase1.py",
        "--data_parallel",
        "--num_steps", "8", "--num_data", "64", "--batch_size", "8",
        "--logit_save_steps", "4", "--major_ratio", "0.9",
        "--root", str(tmp_path / "data"),
        "--work_dir", str(tmp_path / "exp"), "--exp_name", "dp",
    ])
    trainer = mnist_scripts.phase1("color_mnist", str(tmp_path / "data"), "dp")
    assert trainer.mesh is not None and trainer.n_devices == 8
    assert int(trainer.global_step) == 8
    # replicated params bit-identical across all 8 devices
    for leaf in jax.tree.leaves(trainer.g_state.params)[:3]:
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        assert len(shards) == 8
        for arr in shards[1:]:
            np.testing.assert_array_equal(arr, shards[0])
    # logit pickle in the reference format (train-mode for this script)
    out = tmp_path / "exp" / "dp"
    logits = pickle.load(open(out / "logits_netD_train.pkl", "rb"))
    assert logits[8].shape == (64,)
    assert np.isfinite(logits[8]).all()
    assert (out / "checkpoints/netG/netG_8_steps.pth").is_file()


@pytest.mark.slow
def test_graft_dryrun_multichip(mesh):
    # The driver's multi-chip gate: must run in-process on the 8-device
    # CPU mesh (conftest provides it, so no subprocess bootstrap here).
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_matches_single_device_structure(tmp_path, mesh):
    # grad-pmean path must not change pytree structure vs single-device
    g, d, dd, fused, src = _setup(tmp_path, mesh)
    chunk = make_sharded_train_chunk(fused, 1, mesh, donate=False)
    g2, d2, dd2, _ = chunk(
        replicate(g, mesh), replicate(d, mesh), replicate(dd, mesh),
        replicate(src.images, mesh), replicate(src.images, mesh), None,
        jax.random.key(2), jnp.int32(0), None,
    )
    assert jax.tree.structure(g2.params) == jax.tree.structure(g.params)
    assert int(g2.step) == int(g.step) + 1


def _sngan_sharded_setup(mesh, ngf, ndf, n_dis=5, global_bs=64):
    """The flagship CIFAR-10 SNGAN config wired for the mesh (bench.py
    wiring + axis_name), at a chosen channel width."""
    from diagan_tpu.data.arrays import ArrayDataset
    from diagan_tpu.models import get_gan_model
    from diagan_tpu.models import sngan
    import dataclasses

    bundle = get_gan_model("cifar10", model="sngan", loss_type="hinge")
    bundle = dataclasses.replace(
        bundle,
        gen=sngan.SNGANGenerator32(ngf=ngf),
        disc=sngan.SNGANDiscriminator32(ndf=ndf),
    )
    rng = np.random.default_rng(0)
    ds = ArrayDataset.from_images(
        rng.integers(0, 255, (256, 32, 32, 3), dtype=np.uint8)
    )
    n_dev = int(np.prod(mesh.devices.shape))
    tx_g = _make_tx(2e-4, (0.0, 0.9), 1000, "linear", 1)
    tx_d = _make_tx(2e-4, (0.0, 0.9), 1000, "linear", n_dis)
    cfg = StepConfig(
        n_dis=n_dis, batch_size=global_bs // n_dev, nz=bundle.nz,
        loss_type="hinge", drs_loss_type="ns", model="sngan",
        gold=False, gold_step=0, topk=False,
        epoch_steps=len(ds) // global_bs, use_drs=False, quantized=True,
        axis_name="data",
    )
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    x0 = jnp.zeros((2, 32, 32, 3))
    g = create_net_state(bundle.gen, {"params": k}, (z0,), tx_g, train=True)
    d = create_net_state(bundle.disc, {"params": k, "dropout": k}, (x0,), tx_d)
    fused = make_fused_step(
        bundle.gen, bundle.disc, None, tx_g, tx_d, None, cfg, len(ds), 1
    )
    src = DeviceDataSource(ds)
    return (replicate(g, mesh), replicate(d, mesh), fused,
            replicate(src.images, mesh))


@pytest.mark.xslow
@pytest.mark.slow
def test_flagship_sngan_sharded_lowers_full_width(mesh):
    """The headline SNGAN CIFAR-10 config (n_dis=5, batch 64, hinge,
    spectral-norm ResNet G/D at full ngf=256/ndf=128) must build its SPMD
    program through shard_map on the 8-device mesh. Lowering-only: the
    full-width compile is pathological on XLA-CPU (the reason
    dryrun_multichip uses DCGAN), but tracing + StableHLO emission pins
    the sharded program construction for the real flagship widths."""
    g, d, fused, images = _sngan_sharded_setup(mesh, ngf=256, ndf=128)
    chunk = make_sharded_train_chunk(fused, 2, mesh, donate=False)
    lowered = chunk.lower(
        g, d, None, images, images, None, jax.random.key(1),
        jnp.int32(0), None,
    )
    txt = lowered.as_text()
    assert "shard_map" in txt or "sharding" in txt.lower()


@pytest.mark.xslow
@pytest.mark.slow
def test_flagship_sngan_sharded_executes_quarter_width(mesh):
    """Same architecture (spectral norm everywhere, n_dis=5 fused step,
    hinge loss, linear decay) at quarter width compiles AND executes a
    2-step chunk on the mesh; losses finite, params replicated."""
    g, d, fused, images = _sngan_sharded_setup(mesh, ngf=64, ndf=32)
    chunk = make_sharded_train_chunk(fused, 2, mesh, donate=False)
    g, d, _, metrics = chunk(
        g, d, None, images, images, None, jax.random.key(1),
        jnp.int32(0), None,
    )
    errs = np.asarray(metrics["errD"])
    assert errs.shape[0] == 2 and np.isfinite(errs).all()
    kern = jax.device_get(
        jax.tree.leaves(g.params)[0]
    )
    assert np.isfinite(kern).all()

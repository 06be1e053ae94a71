"""End-to-end trainer tests (tiny configs, CPU)."""
import pickle

import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.score import calculate_scores
from diagan_tpu.train import LogTrainer
from diagan_tpu.train.logit_recorder import LogitRecorder
from diagan_tpu.train import checkpoint as ckpt


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    return get_predefined_dataset(
        "color_mnist", root, major_ratio=0.9, num_data=64, seed=0
    )


def _make_trainer(out, ds, **kw):
    bundle = kw.pop("bundle", None) or get_gan_model(
        "color_mnist", loss_type="ns", drs=kw.pop("drs", False),
        gold=kw.get("gold", False), topk=kw.get("topk", False),
    )
    defaults = dict(
        output_path=out, bundle=bundle, dataset=ds, num_steps=8,
        n_dis=1, lr_decay="linear", batch_size=8, print_steps=4,
        vis_steps=8, log_steps=4, save_steps=8, logit_save_steps=4,
        save_logit_after=4, stop_save_logit_after=8, save_logits=True, seed=0,
    )
    defaults.update(kw)
    return LogTrainer(**defaults)


def test_phase1_artifacts(tmp_path, tiny_dataset):
    tr = _make_trainer(tmp_path, tiny_dataset)
    tr.train()
    # reference-format logit pickle
    logits = pickle.load(open(tmp_path / "logits_netD_eval.pkl", "rb"))
    assert sorted(logits) == [4, 8]
    assert logits[8].shape == (64,) and logits[8].dtype == np.float64
    # reference-layout checkpoints
    assert (tmp_path / "checkpoints/netG/netG_8_steps.pth").is_file()
    assert (tmp_path / "checkpoints/netD/netD_8_steps.pth").is_file()
    # scores computable from the recorded window
    sc = calculate_scores(logits, start_epoch=0, end_epoch=9)
    assert sc["ldrm"].shape == (64,)


def test_checkpoint_restore_roundtrip(tmp_path, tiny_dataset):
    tr = _make_trainer(tmp_path / "a", tiny_dataset)
    tr.train()
    g_file = tmp_path / "a" / "checkpoints/netG/netG_8_steps.pth"
    tr2 = _make_trainer(
        tmp_path / "b", tiny_dataset,
        netG_ckpt_file=str(g_file),
        netD_ckpt_file=str(tmp_path / "a" / "checkpoints/netD/netD_8_steps.pth"),
    )
    # restored params identical
    a = jnp.concatenate([v.ravel() for v in
                         __import__("jax").tree.leaves(tr.g_state.params)])
    b = jnp.concatenate([v.ravel() for v in
                         __import__("jax").tree.leaves(tr2.g_state.params)])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert tr2.global_step == 8


@pytest.mark.slow
def test_phase2_weighted_with_drs(tmp_path, tiny_dataset):
    # phase 1
    tr = _make_trainer(tmp_path / "p1", tiny_dataset)
    tr.train()
    logits = pickle.load(open(tmp_path / "p1" / "logits_netD_eval.pkl", "rb"))
    sc = calculate_scores(logits, start_epoch=0, end_epoch=9)
    w = sc["ldr_conf_1.0_ratio_50"]
    # phase 2: weighted resampling + dual discriminator
    tr2 = _make_trainer(
        tmp_path / "p2", tiny_dataset, drs=True, sample_weights=w,
        netG_ckpt_file=str(tmp_path / "p1/checkpoints/netG/netG_8_steps.pth"),
        netD_ckpt_file=str(tmp_path / "p1/checkpoints/netD/netD_8_steps.pth"),
        netD_drs_ckpt_file=str(tmp_path / "p1/checkpoints/netD/netD_8_steps.pth"),
        num_steps=16, save_logit_after=8, stop_save_logit_after=16,
        save_steps=16,
    )
    assert tr2.global_step == 8
    tr2.train()
    assert (tmp_path / "p2/checkpoints/netD_drs/netD_drs_16_steps.pth").is_file()
    # phase-2 recording keys by netD_drs (reference trainer.py:330-340)
    logits2 = pickle.load(open(tmp_path / "p2" / "logits_netD_drs_eval.pkl", "rb"))
    assert all(k >= 8 for k in logits2)


def test_resume_is_bitwise_deterministic(tmp_path, tiny_dataset):
    """An 8-step straight run and a 4-step run resumed from its step-4
    checkpoint end with bit-identical G and D params: batch/latent keys are
    fold_in(seed, global_step), so resume replays the exact stream, and the
    checkpoint carries optimizer state + model collections. Pins the
    restart-determinism observed on hardware (docs/VALIDATION.md, FFHQ
    soak) as a unit test."""
    import jax

    tr_a = _make_trainer(tmp_path / "straight", tiny_dataset, save_steps=4)
    tr_a.train()
    # resume from the straight run's own mid-run (step-4) checkpoint; the
    # resuming trainer must use the same num_steps or the linear-decay
    # schedule (and hence the params) legitimately differs
    tr_c = _make_trainer(
        tmp_path / "resumed", tiny_dataset, save_steps=4,
        netG_ckpt_file=str(
            tmp_path / "straight/checkpoints/netG/netG_4_steps.pth"),
        netD_ckpt_file=str(
            tmp_path / "straight/checkpoints/netD/netD_4_steps.pth"),
    )
    assert tr_c.global_step == 4
    tr_c.train()
    for name, a, c in (
        ("G", tr_a.g_state.params, tr_c.g_state.params),
        ("D", tr_a.d_state.params, tr_c.d_state.params),
    ):
        for pa, pc in zip(jax.tree.leaves(a), jax.tree.leaves(c)):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pc),
                                          err_msg=f"{name} params diverged")


def test_gold_and_topk_smoke(tmp_path, tiny_dataset):
    tr = _make_trainer(
        tmp_path, tiny_dataset, gold=True, topk=True, gold_step=4,
        save_logits=False,
    )
    tr.train()
    assert tr.global_step == 8


@pytest.mark.slow
def test_ssgan_smoke(tmp_path, tiny_dataset):
    bundle = get_gan_model("cifar10", model="ssgan", loss_type="hinge")
    ds32 = tiny_dataset
    tr = _make_trainer(tmp_path, ds32, bundle=bundle, save_logits=False,
                       num_steps=2, print_steps=2, vis_steps=2, log_steps=2,
                       save_steps=2, batch_size=4)
    tr.train()
    assert tr.global_step == 2


@pytest.mark.slow
def test_sngan_bf16_compute_matches_fp32():
    """--bf16 on the SNGAN family: params stay fp32 with an identical tree,
    G output returns fp32 and tracks the fp32 model on the same params,
    D logits track fp32, and grads through both stay finite."""
    import jax

    b32 = get_gan_model("cifar10", model="sngan", loss_type="hinge")
    b16 = get_gan_model("cifar10", model="sngan", loss_type="hinge", bf16=True)
    k = jax.random.key(0)
    z = jax.random.normal(k, (4, b32.nz))
    gv = b32.gen.init({"params": k}, z, train=False)
    assert jax.tree.structure(gv) == jax.tree.structure(
        b16.gen.init({"params": k}, z, train=False)
    )
    a = b32.gen.apply(gv, z, train=False)
    b = b16.gen.apply(gv, z, train=False)  # same fp32 params
    assert b.dtype == jnp.float32
    assert jax.tree.leaves(gv["params"])[0].dtype == jnp.float32
    assert float(jnp.mean(jnp.abs(a - b))) < 0.05

    dv = b32.disc.init({"params": k}, a)
    la = b32.disc.apply(dv, a)[0]
    lb = b16.disc.apply(dv, a)[0]
    assert lb.dtype == jnp.float32
    assert float(jnp.mean(jnp.abs(la - lb))) < 0.05 * (
        1.0 + float(jnp.mean(jnp.abs(la)))
    )

    def d_loss(params):
        logits, _ = b16.disc.apply({**dv, "params": params}, b)
        return jnp.mean(jax.nn.relu(1.0 - logits))

    grads = jax.grad(d_loss)(dv["params"])
    assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


def test_dcgan_bf16_compute_matches_fp32():
    """bf16 on the MNIST DCGAN: identical param tree, fp32 outputs, value
    agreement with the fp32 model on shared params."""
    import jax

    b32 = get_gan_model("color_mnist")
    b16 = get_gan_model("color_mnist", bf16=True)
    k = jax.random.key(0)
    z = jax.random.normal(k, (4, b32.nz))
    gv = b32.gen.init({"params": k}, z, train=False)
    assert jax.tree.structure(gv) == jax.tree.structure(
        b16.gen.init({"params": k}, z, train=False)
    )
    a = b32.gen.apply(gv, z, train=False)
    b = b16.gen.apply(gv, z, train=False)
    assert b.dtype == jnp.float32
    assert float(jnp.mean(jnp.abs(a - b))) < 0.05
    dv = b32.disc.init({"params": k, "dropout": k}, a)
    la = b32.disc.apply(dv, a, train=False)[0]
    lb = b16.disc.apply(dv, a, train=False)[0]
    assert lb.dtype == jnp.float32
    assert float(jnp.mean(jnp.abs(la - lb))) < 0.05 * (
        1.0 + float(jnp.mean(jnp.abs(la)))
    )


def test_logit_recorder_scatter():
    N = 37
    images = np.random.default_rng(0).integers(0, 255, (N, 4, 4, 1), np.uint8)
    rec = LogitRecorder(N, 2, batch_size=8)

    def fake_d(params, state, batch, rng):
        return (jnp.mean(batch, axis=(1, 2, 3)), {}), state

    rec.record(fake_d, None, {}, jnp.asarray(images), 7, quantized=True)
    want = images.reshape(N, -1).mean(1) / 127.5 - 1.0
    np.testing.assert_allclose(np.asarray(rec.buffer[0]), want, atol=1e-5)
    d = rec.as_dict()
    assert list(d) == [7] and d[7].dtype == np.float64
    # state_dict roundtrip (mid-window preemption recovery)
    rec2 = LogitRecorder(N, 2, batch_size=8)
    rec2.load_state_dict(rec.state_dict())
    assert rec2.count == 1
    np.testing.assert_allclose(np.asarray(rec2.buffer), np.asarray(rec.buffer))


def test_concat_d_pass_batch_decoupled():
    """The fused real|fake D pass (steps.py concat_d) requires that the
    SNGAN-family discriminators are batch-decoupled: D over a concatenated
    batch must equal D over the halves separately (update_stats=False)."""
    import jax

    from diagan_tpu.models.sngan import SNGANDiscriminator32

    disc = SNGANDiscriminator32(ndf=32)
    k = jax.random.key(0)
    x = jax.random.normal(k, (8, 32, 32, 3))
    variables = disc.init({"params": k}, x[:2])
    (l_all, _), = [disc.apply(variables, x, update_stats=False)]
    (l_a, _), = [disc.apply(variables, x[:4], update_stats=False)]
    (l_b, _), = [disc.apply(variables, x[4:], update_stats=False)]
    np.testing.assert_allclose(
        np.asarray(l_all), np.concatenate([np.asarray(l_a), np.asarray(l_b)]),
        atol=1e-5,
    )


def test_pipelined_logging_writes_every_log_step(tmp_path, tiny_dataset):
    """Chunked+pipelined logging must emit a scalar row for EVERY
    log_steps multiple (interior rows come from the stacked metrics),
    in order, through vis/save/logit boundaries and loop exit."""
    import json

    tr = _make_trainer(tmp_path, tiny_dataset, num_steps=12, log_steps=2,
                       print_steps=4, vis_steps=12, save_steps=12,
                       logit_save_steps=6, save_logit_after=6,
                       stop_save_logit_after=12)
    tr.train()
    rows = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    steps = [r["step"] for r in rows]
    assert steps == list(range(2, 13, 2)), steps
    # reference scalar names: lr_{idx} per optimizer (scheduler.py:104);
    # this trainer has optD + optG (no drs) -> lr_0, lr_1
    assert all("errD" in r and "lr_0" in r and "lr_1" in r for r in rows)


@pytest.mark.slow
def test_simultaneous_g_matches_sequential_d_update():
    """cfg.simultaneous_g merges the last D update and the G update. The
    D side must be bit-equivalent to the sequential path: same keys ->
    same real batch and same (stop-grad) fake batch -> identical D loss
    and identical post-step D params. Only the G update semantics differ
    (shared z, pre-update D params)."""
    import jax

    from diagan_tpu.data.arrays import ArrayDataset
    from diagan_tpu.data.pipeline import DeviceDataSource
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.steps import StepConfig, make_fused_step
    from diagan_tpu.train.trainer import _make_tx

    bundle = get_gan_model("color_mnist", loss_type="ns")
    rng = np.random.default_rng(0)
    ds = ArrayDataset.from_images(
        rng.integers(0, 255, (32, 32, 32, 3), dtype=np.uint8)
    )
    src = DeviceDataSource(ds)

    def build(simultaneous):
        import jax.numpy as jnp

        cfg = StepConfig(
            n_dis=2, batch_size=4, nz=bundle.nz, loss_type="ns",
            drs_loss_type="ns", model="dcgan", gold=False, gold_step=0,
            topk=False, epoch_steps=8, use_drs=False, quantized=True,
            simultaneous_g=simultaneous,
        )
        k = jax.random.key(0)
        z0 = jnp.zeros((2, bundle.nz))
        x0 = jnp.zeros((2, 32, 32, 3))
        tx_g = _make_tx(1e-4, (0.5, 0.9), 10, "linear", 1)
        tx_d = _make_tx(1e-4, (0.5, 0.9), 10, "linear", 2)
        g = create_net_state(bundle.gen, {"params": k}, (z0,), tx_g,
                             train=True)
        d = create_net_state(bundle.disc, {"params": k, "dropout": k},
                             (x0,), tx_d)
        fused = make_fused_step(bundle.gen, bundle.disc, None, tx_g, tx_d,
                                None, cfg, len(ds), len(ds))
        return fused, g, d

    import jax.numpy as jnp

    key = jax.random.key(7)
    step = jnp.int32(0)
    fused_seq, g0, d0 = build(False)
    g_a, d_a, _, m_a = fused_seq(g0, d0, None, src.images, None, None, key,
                                 step)
    fused_sim, g0, d0 = build(True)
    g_b, d_b, _, m_b = fused_sim(g0, d0, None, src.images, None, None, key,
                                 step)

    np.testing.assert_allclose(float(m_a["errD"]), float(m_b["errD"]),
                               rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(d_a.params), jax.tree.leaves(d_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)
    # G updated in both variants (different z/semantics, so just sanity)
    assert np.isfinite(float(m_b["errG"]))
    changed = any(
        not np.allclose(np.asarray(pa), np.asarray(pb))
        for pa, pb in zip(jax.tree.leaves(g0.params),
                          jax.tree.leaves(g_b.params))
    )
    assert changed


def test_folded_sweep_matches_standalone_recorder(tmp_path, tiny_dataset):
    """fold_sweep=True runs each in-window logit sweep inside the train
    chunk program; the recorded pickles must be bit-identical to the
    legacy separate-dispatch recorder path."""
    tr_fold = _make_trainer(tmp_path / "fold", tiny_dataset, fold_sweep=True)
    tr_fold.train()
    tr_sep = _make_trainer(tmp_path / "sep", tiny_dataset, fold_sweep=False)
    tr_sep.train()
    a = pickle.load(open(tmp_path / "fold/logits_netD_eval.pkl", "rb"))
    b = pickle.load(open(tmp_path / "sep/logits_netD_eval.pkl", "rb"))
    assert sorted(a) == sorted(b) == [4, 8]
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # and training itself is unaffected by which path recorded
    ga = jnp.asarray(tr_fold.g_state.params["Dense_0"]["kernel"])
    gb = jnp.asarray(tr_sep.g_state.params["Dense_0"]["kernel"])
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


@pytest.mark.slow
def test_folded_sweep_matches_standalone_recorder_with_drs(tmp_path,
                                                           tiny_dataset):
    """Phase-2 shape: the folded sweep must read the DRS discriminator."""
    outs = {}
    for name, fold in (("fold", True), ("sep", False)):
        tr = _make_trainer(
            tmp_path / name, tiny_dataset, drs=True, fold_sweep=fold,
            save_eval_logits=False,
        )
        tr.train()
        outs[name] = pickle.load(
            open(tmp_path / name / "logits_netD_drs_train.pkl", "rb"))
    assert sorted(outs["fold"]) == sorted(outs["sep"]) == [4, 8]
    for k in outs["fold"]:
        np.testing.assert_array_equal(outs["fold"][k], outs["sep"][k])

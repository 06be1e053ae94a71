"""Trainer extras: toy-dataset path, evaluate driver end-to-end, stats cache."""
import json

import numpy as np
import pytest

from diagan_tpu.data import get_predefined_dataset
from diagan_tpu.models import get_gan_model
from diagan_tpu.train import LogTrainer


@pytest.fixture(scope="module")
def toy_run(tmp_path_factory):
    out = tmp_path_factory.mktemp("toy")
    ds = get_predefined_dataset("25gaussian", root=None, n_samples=500)
    bundle = get_gan_model("25gaussian", loss_type="ns")
    tr = LogTrainer(
        output_path=out, bundle=bundle, dataset=ds, num_steps=6,
        n_dis=1, batch_size=16, print_steps=3, vis_steps=6, log_steps=3,
        save_steps=6, logit_save_steps=3, save_logits=True,
        save_logit_after=0, stop_save_logit_after=10, seed=0,
    )
    tr.train()
    return out, tr


def test_toy_training_runs(toy_run):
    out, tr = toy_run
    assert tr.global_step == 6
    pts = np.asarray(tr.generate_images(n=32))
    assert pts.shape == (32, 2) and np.isfinite(pts).all()


def test_toy_logit_recording(toy_run):
    import pickle

    out, _ = toy_run
    logits = pickle.load(open(out / "logits_netD_eval.pkl", "rb"))
    assert all(len(v) == 500 for v in logits.values())


@pytest.fixture(scope="module")
def mnist_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    out = tmp_path_factory.mktemp("exp")
    ds = get_predefined_dataset("color_mnist", root, major_ratio=0.9,
                                num_data=64, seed=0)
    bundle = get_gan_model("color_mnist", loss_type="ns", drs=True)
    tr = LogTrainer(
        output_path=out, bundle=bundle, dataset=ds, num_steps=4,
        n_dis=1, batch_size=8, print_steps=4, vis_steps=4, log_steps=4,
        save_steps=4, save_logits=False, seed=0,
    )
    tr.train()
    return root, out, ds, bundle


@pytest.mark.slow
def test_evaluate_checkpoint_fid_with_drs(mnist_run, tmp_path):
    from diagan_tpu.eval.evaluate import evaluate_checkpoint
    from diagan_tpu.eval.inception import InceptionFeaturizer

    root, out, ds, bundle = mnist_run
    featurizer = InceptionFeaturizer(batch_size=16)
    res = evaluate_checkpoint(
        "fid", bundle=bundle, log_dir=out, evaluate_step=4,
        real_images=ds.images, num_real_samples=32, num_fake_samples=32,
        num_runs=1, use_drs=True, featurizer=featurizer, batch_size=16,
    )
    assert "0" in res["scores"]
    assert np.isfinite(res["scores"]["0"])
    assert res["inception_weights"] == "random"
    # stats cached in the reference layout
    assert (out / "metrics/fid/statistics").is_dir()
    # json written in the reference layout
    f = out / "evaluate/step-4/fid_0k_0k.json"
    assert f.is_file()
    assert json.loads(f.read_text())["use_drs"] is True


@pytest.mark.slow
def test_evaluate_checkpoint_pr_and_is(mnist_run):
    from diagan_tpu.eval.evaluate import evaluate_checkpoint
    from diagan_tpu.eval.inception import InceptionFeaturizer

    root, out, ds, bundle = mnist_run
    featurizer = InceptionFeaturizer(batch_size=16)
    pr = evaluate_checkpoint(
        "pr", bundle=bundle, log_dir=out, evaluate_step=4,
        real_images=ds.images, num_real_samples=32, num_fake_samples=32,
        featurizer=featurizer, batch_size=16,
    )
    score = pr["scores"]["0"]
    assert 0 <= score["precision"] <= 1 and 0 <= score["recall"] <= 1
    is_res = evaluate_checkpoint(
        "inception_score", bundle=bundle, log_dir=out, evaluate_step=4,
        num_fake_samples=32, featurizer=featurizer, batch_size=16,
    )
    assert is_res["scores"]["0"] > 0


@pytest.mark.slow
def test_logit_buffer_survives_restart(tmp_path):
    """A mid-window restart must keep previously recorded snapshots."""
    root = tmp_path / "d"
    ds = get_predefined_dataset("color_mnist", root, major_ratio=0.9,
                                num_data=32, seed=0)
    bundle = get_gan_model("color_mnist", loss_type="ns")
    common = dict(
        bundle=bundle, dataset=ds, n_dis=1, batch_size=8, print_steps=2,
        vis_steps=100, log_steps=2, save_steps=4, logit_save_steps=2,
        save_logit_after=0, stop_save_logit_after=100, save_logits=True,
        seed=0, output_path=tmp_path / "exp", log_dir=tmp_path / "exp",
    )
    tr = LogTrainer(num_steps=4, **common)
    tr.train()
    assert tr.recorder.count == 2  # steps 2, 4
    # "restart": new trainer resuming from the step-4 checkpoints
    tr2 = LogTrainer(
        num_steps=8,
        netG_ckpt_file=str(tmp_path / "exp/checkpoints/netG/netG_4_steps.pth"),
        netD_ckpt_file=str(tmp_path / "exp/checkpoints/netD/netD_4_steps.pth"),
        **common,
    )
    assert tr2.recorder.count == 2  # restored from logit_buffer.npz
    tr2.train()
    import pickle

    logits = pickle.load(open(tmp_path / "exp/logits_netD_eval.pkl", "rb"))
    assert sorted(logits) == [2, 4, 6, 8]


@pytest.mark.slow
def test_inclusive_trainer_smoke(tmp_path):
    """Inclusive-GAN aux losses must flow through the fused step (regression
    for the aux-metrics tracer leak)."""
    from diagan_tpu.eval.inception import InceptionFeaturizer
    from diagan_tpu.train.inclusive import InclusiveTrainer

    ds = get_predefined_dataset("color_mnist", tmp_path / "d",
                                major_ratio=0.9, num_data=32, seed=0)
    bundle = get_gan_model("color_mnist", loss_type="ns")
    tr = InclusiveTrainer(
        output_path=tmp_path / "exp", bundle=bundle, dataset=ds,
        num_steps=2, n_dis=1, batch_size=4, print_steps=1, vis_steps=100,
        log_steps=1, save_steps=2, save_logits=False, seed=0,
        featurizer=InceptionFeaturizer(batch_size=8),
        latent_factor=2,
    )
    tr.train()
    assert tr.global_step == 2
    assert tr.nearest_latent.shape == (32, bundle.nz)


def test_classifier_train_and_predict_learns_color():
    """train_classifier + predict_classifier on a trivially separable
    probe task (red-vs-green dominant images), the shape of the
    color-MNIST bias probe (train_color_mnist_feature.py). Small 8x8
    inputs + kernel-3 net: XLA-CPU large-kernel convs are pathologically
    slow, and this tests the trainer, not the conv."""
    import numpy as np

    from diagan_tpu.models.convnets import Simple3DNet
    from diagan_tpu.train.classifier import predict_classifier, train_classifier

    rng = np.random.default_rng(0)
    n = 128
    labels = rng.integers(0, 2, n)
    images = np.zeros((n, 8, 8, 3), np.uint8)
    images[labels == 0, :, :, 0] = 200  # red class
    images[labels == 1, :, :, 1] = 200  # green class
    images += rng.integers(0, 30, images.shape).astype(np.uint8)

    model = Simple3DNet(num_labels=2)
    params, state, history = train_classifier(
        model, images, labels, epochs=3, batch_size=32
    )
    assert history[-1]["acc"] > 0.9
    logits = predict_classifier(model, params, state, images, batch_size=32)
    acc = (logits.argmax(-1) == labels).mean()
    assert acc > 0.9


def test_classifier_predict_smaller_than_batch():
    """Regression: predict on n < batch_size used to truncate the pad
    (np.zeros_like(slab[:pad]) caps at len(slab)) and crash the reshape."""
    import numpy as np

    from diagan_tpu.models.convnets import Simple3DNet
    from diagan_tpu.train.classifier import predict_classifier

    import jax

    model = Simple3DNet(num_labels=2)
    x0 = np.zeros((4, 8, 8, 3), np.uint8)
    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((2, 8, 8, 3)), train=False,
    )
    params = variables.pop("params")
    images = np.random.default_rng(1).integers(0, 255, (18, 8, 8, 3), np.uint8)
    logits = predict_classifier(model, params, variables, images,
                                batch_size=256)
    assert logits.shape == (18, 2)


@pytest.mark.slow
def test_eval_fake_cache_shared_across_metrics(mnist_run, monkeypatch):
    """The generated-image cache (reference fid_score.py:131-171): the
    first metric invocation persists the seed's uint8 fakes under
    evaluate/step-N/images/, and subsequent metrics for the same seed load
    them instead of regenerating."""
    from diagan_tpu.eval import evaluate as ev
    from diagan_tpu.eval.inception import InceptionFeaturizer

    root, out, ds, bundle = mnist_run
    featurizer = InceptionFeaturizer(batch_size=16)
    ev.evaluate_checkpoint(
        "fid", bundle=bundle, log_dir=out, evaluate_step=4,
        real_images=ds.images, num_real_samples=32, num_fake_samples=32,
        featurizer=featurizer, batch_size=16, start_seed=5,
    )
    cache = out / "evaluate/step-4/images/fid_gen_images_0k_5.npy"
    assert cache.is_file()
    assert np.load(cache).shape[0] == 32

    def _boom(*a, **k):
        raise AssertionError("fakes regenerated despite cache")

    monkeypatch.setattr(ev.Sampler, "generate_images", _boom)
    res = ev.evaluate_checkpoint(
        "inception_score", bundle=bundle, log_dir=out, evaluate_step=4,
        num_fake_samples=32, featurizer=featurizer, batch_size=16,
        start_seed=5,
    )
    assert res["scores"]["5"] > 0

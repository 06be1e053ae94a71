"""Tests for DRS, metrics, and the CAE protocol."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.eval.drs import DRS
from diagan_tpu.eval import metrics as M
from diagan_tpu.eval.cae_protocol import eval_ae_score, train_cae


def test_drs_acceptance_rate():
    # G produces 1-D "images"; D logit standard normal. With the
    # percentile-80 gamma the top 20% accept with p > 0.5 and the rest with
    # p < 0.5 (soft sigmoid rule, reference drs.py:46-57); the aggregate
    # acceptance for N(0,1) logits sits near 1/3.
    def gen_fn(z):
        return z[:, :1]

    def disc_fn(x):
        return x[:, 0]

    drs = DRS(gen_fn, disc_fn, nz=4, key=jax.random.key(0), batch_size=256)
    rate = drs.acceptance_rate_probe(num_batches=20)
    assert 0.25 < rate < 0.45, rate


def test_drs_quota_and_shapes():
    def gen_fn(z):
        return jnp.tanh(z).reshape(-1, 2, 2, 1)

    def disc_fn(x):
        return x.reshape(x.shape[0], -1).sum(-1)

    drs = DRS(gen_fn, disc_fn, nz=4, key=jax.random.key(1), batch_size=64)
    out = drs.generate_images(100)
    assert out.shape == (100, 2, 2, 1)
    assert np.isfinite(out).all()


def test_drs_prefers_high_logit_samples():
    # acceptance probability must increase with the D logit
    def gen_fn(z):
        return z[:, :1]

    def disc_fn(x):
        return x[:, 0]

    drs = DRS(gen_fn, disc_fn, nz=2, key=jax.random.key(2), batch_size=512)
    accepted = drs.generate_images(500)[:, 0]
    # raw samples are N(0,1); accepted mean must be clearly positive
    assert accepted.mean() > 0.5


def test_frechet_distance_closed_form():
    # identical distributions -> 0; shifted mean -> ||d||^2
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert abs(M.frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    mu2 = np.ones(4) * 2.0
    assert abs(M.frechet_distance(mu, sigma, mu2, sigma) - 16.0) < 1e-6


def test_fid_sensitivity():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 16))
    b = rng.normal(size=(500, 16))
    c = rng.normal(loc=1.0, size=(500, 16))
    near = M.fid_from_features(a, b)
    far = M.fid_from_features(a, c)
    assert near < far


def test_pr_matches_reference_oracle():
    """Cross-check against an independent numpy transliteration of
    compute_pr.py:65-97 (squared distances, k+1 smallest incl. self)."""
    rng = np.random.default_rng(1)
    real = rng.normal(size=(200, 8)).astype(np.float32)
    fake = rng.normal(loc=0.5, size=(150, 8)).astype(np.float32)

    def sq(x, y):
        nx = (x**2).sum(1)[:, None]
        ny = (y**2).sum(1)[None, :]
        return nx - 2 * x @ y.T + ny

    def radii(f, k):
        d = sq(f, f)
        part = np.partition(d, k, axis=-1)[:, : k + 1]
        return part.max(-1)

    k = 3
    rr, fr = radii(real, k), radii(fake, k)
    drf = sq(real, fake)
    want_p = (drf < rr[:, None]).any(0).mean()
    want_r = (drf < fr[None, :]).any(1).mean()

    got = M.compute_pr(real, fake, nearest_k=k)
    assert abs(got["precision"] - want_p) < 1e-6
    assert abs(got["recall"] - want_r) < 1e-6
    partial = M.compute_partial_recall(real[:50], fake, nearest_k=k)
    want_pr = (sq(real[:50], fake) < fr[None, :]).any(1).mean()
    assert abs(partial["recall"] - want_pr) < 1e-6


def test_inception_score_uniform_vs_peaked():
    n, c = 200, 10
    uniform = np.zeros((n, c))
    peaked = np.full((n, c), -50.0)
    peaked[np.arange(n), np.arange(n) % c] = 50.0
    is_u, _ = M.inception_score_from_logits(uniform)
    is_p, _ = M.inception_score_from_logits(peaked)
    assert is_u < 1.1
    assert is_p > 5.0


def test_kid_zero_for_same_distribution():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(600, 8))
    b = rng.normal(size=(600, 8))
    c = rng.normal(loc=1.0, size=(600, 8))
    same, _ = M.kid_from_features(a, b, num_subsets=5, subset_size=300)
    diff, _ = M.kid_from_features(a, c, num_subsets=5, subset_size=300)
    assert abs(same) < 0.05
    assert diff > same


def test_normalize_images_minmax():
    imgs = np.stack([np.linspace(-1, 1, 16).reshape(4, 4, 1)] * 2)
    out = M.normalize_images(imgs)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


@pytest.mark.slow
def test_cae_protocol_end_to_end(tmp_path):
    from diagan_tpu.models.cae import CAE32

    rng = np.random.default_rng(0)
    gen_imgs = rng.integers(0, 255, (256, 32, 32, 3), np.uint8)
    real_imgs = rng.integers(0, 255, (100, 32, 32, 3), np.uint8)
    cae = CAE32()
    re = train_cae(cae, gen_imgs, real_imgs, tmp_path / "base", epochs=2,
                   batch_size=64, model_save_epochs=100)
    assert re.shape == (100, 2)
    assert np.isfinite(re).all()
    # second "run" with scaled errors, then the comparison math
    np.save(tmp_path / "res" / "cae_training_loss.npy", re * 0.9) \
        if (tmp_path / "res").mkdir() or True else None
    minority = np.zeros(100, bool)
    minority[:10] = True
    out = eval_ae_score(
        tmp_path / "base" / "cae_training_loss.npy",
        tmp_path / "res" / "cae_training_loss.npy",
        minority,
    )
    assert abs(out["all"]["pct_diff"] + 10.0) < 1e-4
    assert abs(out["minority"]["pct_diff"] + 10.0) < 1e-4


def test_drs_device_accept_matches_host_accept():
    """The on-device accept test (packed transfer path) implements the
    same math as the host reference-port `_accept`."""
    import jax.numpy as jnp

    def gen_fn(z):
        return jnp.tanh(jnp.tile(z[:, :1, None, None], (1, 8, 8, 3)))

    def disc_fn(x):
        return x.mean(axis=(1, 2, 3)) * 5.0

    drs = DRS(gen_fn, disc_fn, nz=4, key=jax.random.key(5), batch_size=128)
    rng = np.random.default_rng(0)
    ldr = rng.normal(0, 2, 128).astype(np.float32)
    u = rng.uniform(size=128).astype(np.float32)
    dev = np.asarray(
        drs._accept_device(jnp.asarray(ldr), jnp.asarray(u),
                           jnp.float32(drs.maximum))
    )
    host = drs._accept(ldr.astype(np.float64), u.astype(np.float64))
    # fp32-vs-fp64 rounding can flip samples sitting exactly at the
    # accept boundary; none do in this draw
    np.testing.assert_array_equal(dev, host)


def test_device_minmax_matches_host_normalize():
    from diagan_tpu.eval import metrics as M
    from diagan_tpu.eval.drs import minmax_uint8
    import jax

    rng = np.random.default_rng(3)
    x = rng.uniform(-1.2, 0.9, (16, 8, 8, 3)).astype(np.float32)
    dev = np.asarray(jax.jit(minmax_uint8)(x))
    host = M.normalize_images(x)
    # identical math; allow 1-count rounding at the fp32 boundary
    assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1


def test_eval_restore_ignores_optimizer_structure(tmp_path):
    """Eval loads must not depend on the TRAINING optimizer's opt_state
    pytree: a checkpoint saved with a linear-decay schedule restores into
    an eval template built with a plain Adam (params_only)."""
    import jax
    import jax.numpy as jnp

    from diagan_tpu.models import get_gan_model
    from diagan_tpu.train import checkpoint as ckpt
    from diagan_tpu.train.state import create_net_state
    from diagan_tpu.train.trainer import _make_tx

    bundle = get_gan_model("color_mnist", loss_type="ns")
    k = jax.random.key(0)
    z0 = jnp.zeros((2, bundle.nz))
    tx_train = _make_tx(2e-4, (0.0, 0.9), 1000, "linear", 5)
    g_train = create_net_state(bundle.gen, {"params": k}, (z0,), tx_train,
                               train=True)
    path = ckpt.save_net(g_train, tmp_path, "netG", 7)

    tx_eval = _make_tx(2e-4, (0.0, 0.9), None, None)
    g_eval = create_net_state(bundle.gen, {"params": jax.random.key(1)},
                              (z0,), tx_eval, train=True)
    restored = ckpt.restore_net(g_eval, path, params_only=True)
    a = jax.tree.leaves(restored.params)[0]
    b = jax.tree.leaves(g_train.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(g_train.step)

"""StyleGAN2 + ADA tests (tiny sizes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diagan_tpu.models.ada import AdaptiveAugment, augment
from diagan_tpu.models.stylegan2 import (
    StyleGAN2Discriminator,
    StyleGAN2Generator,
)


@pytest.fixture(scope="module")
def gen16():
    g = StyleGAN2Generator(size=16)
    z = jnp.ones((2, 512))
    k = jax.random.key(0)
    return g, g.init({"params": k, "noise": k}, z)


def test_generator_shapes_and_finite(gen16):
    g, gv = gen16
    k = jax.random.key(1)
    z = jax.random.normal(k, (2, 512))
    imgs = g.apply(gv, z, rngs={"noise": k})
    assert imgs.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(imgs).all())


def test_style_mixing_changes_output(gen16):
    g, gv = gen16
    k = jax.random.key(2)
    z1 = jax.random.normal(k, (2, 512))
    z2 = jax.random.normal(jax.random.key(3), (2, 512))
    a = g.apply(gv, [z1, z1], None, method=StyleGAN2Generator.sample,
                rngs={"noise": k})
    b = g.apply(gv, [z1, z2], 2, method=StyleGAN2Generator.sample,
                rngs={"noise": k})
    assert float(jnp.abs(a - b).max()) > 1e-4


def test_truncation_pulls_to_mean(gen16):
    g, gv = gen16
    k = jax.random.key(4)
    w_mean = g.apply(gv, k, 256, method=StyleGAN2Generator.mean_latent)
    z = jax.random.normal(k, (4, 512))
    full = g.apply(gv, [z], None, 1.0, w_mean,
                   method=StyleGAN2Generator.sample, rngs={"noise": k})
    trunc = g.apply(gv, [z], None, 0.1, w_mean,
                    method=StyleGAN2Generator.sample, rngs={"noise": k})
    # heavily truncated samples are closer to each other than full samples
    def spread(x):
        return float(jnp.mean(jnp.var(x, axis=0)))

    assert spread(trunc) < spread(full)


def test_discriminator_runs(gen16):
    g, gv = gen16
    k = jax.random.key(5)
    imgs = g.apply(gv, jax.random.normal(k, (4, 512)), rngs={"noise": k})
    d = StyleGAN2Discriminator(size=16)
    dv = d.init({"params": k}, imgs)
    logits, aux = d.apply(dv, imgs)
    assert logits.shape == (4,)
    # gradient flows end-to-end G -> D
    def loss(gp):
        fake = g.apply({"params": gp}, jax.random.normal(k, (2, 512)),
                       rngs={"noise": k})
        return jnp.mean(d.apply(dv, fake)[0])

    grads = jax.grad(loss)(gv["params"])
    total = sum(float(jnp.abs(v).sum()) for v in jax.tree.leaves(grads))
    assert np.isfinite(total) and total > 0


def test_ada_identity_at_p0():
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    )
    out = augment(imgs, jax.random.key(0), 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)


def test_ada_transforms_at_p1():
    imgs = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    )
    out = augment(imgs, jax.random.key(1), 1.0)
    assert out.shape == imgs.shape
    assert float(jnp.abs(out - imgs).mean()) > 0.05


def test_adaptive_augment_direction():
    ada = AdaptiveAugment(ada_aug_target=0.6, ada_aug_len=1000, update_every=1)
    # D confidently positive on real -> overfit signal -> p rises
    for _ in range(5):
        p_up = ada.tune(16.0, 16)
    assert p_up > 0
    ada2 = AdaptiveAugment(ada_aug_target=0.6, ada_aug_len=1000, update_every=1)
    ada2.ada_aug_p = 0.5
    for _ in range(5):
        p_down = ada2.tune(-16.0, 16)
    assert p_down < 0.5


@pytest.mark.slow
def test_g_step_augments_fake_and_static_off_compiles_out(tmp_path):
    """Two parity pins (reference train_ffhq.py:262-268):
    1. the generator loss scores the AUGMENTED fake — with augmentation
       active at p=1 the G update must differ from an identical trainer at
       p=0 (same seeds; at p=0 every transform is the identity);
    2. augment_p=None statically disables augmentation (use_augment False,
       no ada controller) and the trainer still trains."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), np.uint8)

    def run(p):
        tr = StyleGAN2Trainer(
            tmp_path / f"p{p}", StyleGAN2Generator(size=16),
            StyleGAN2Discriminator(size=16), imgs, num_steps=1,
            batch_size=2, log_every=1, save_every=10000, augment_p=p,
        )
        tr.train()
        return tr

    tr_off = run(None)
    assert tr_off.use_augment is False and tr_off.ada is None
    assert int(tr_off.g_state.step) == 1

    # "compiled out" means the PROGRAM no longer contains the warp: the
    # affine resample inverts the 3x3 transform batch (jnp.linalg.inv ->
    # lu/triangular_solve primitives), which nothing else in the D step
    # uses — assert on the traced jaxpr, not just the Python flags.
    # The host picks the program variant per chunk from ada_aug_p
    # (build_variant): the live variant carries the warp, the p==0
    # variant (and the augment-off trainer) must not.
    def d_jaxpr(p, live):
        t = StyleGAN2Trainer(
            tmp_path / f"jx{p}_{live}", StyleGAN2Generator(size=16),
            StyleGAN2Discriminator(size=16), imgs, num_steps=1,
            batch_size=2, log_every=1, save_every=10000, augment_p=p,
            fuse_steps=False,
        )
        uf = t._variant(live)["uf"]
        return str(jax.make_jaxpr(
            lambda d, gp, k, ap, im: uf["d"](d, gp, k, ap, im)
        )(t.d_state, t.g_state.params, jax.random.key(0), 0.0, t.images))

    assert "triangular_solve" in d_jaxpr(0.0, True)
    assert "triangular_solve" not in d_jaxpr(0.0, False)
    assert "triangular_solve" not in d_jaxpr(None, False)


def test_adaptive_ada_p_survives_resume(tmp_path):
    """The checkpoint carries ada_aug_p; on load the ADAPTIVE controller
    must be synced too — tune() returns ITS internal p, so a fresh
    controller left at 0.0 silently collapsed augmentation strength at the
    first update after every preemption/restart."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), np.uint8)

    def make(out):
        return StyleGAN2Trainer(
            tmp_path / out, StyleGAN2Generator(size=16),
            StyleGAN2Discriminator(size=16), imgs, num_steps=4,
            batch_size=2, log_every=1, save_every=10000, augment_p=0.0,
        )

    tr = make("a")
    tr.ada_aug_p = 0.37
    tr._save_ckpt(4)

    tr2 = make("b")
    step = tr2.load_ckpt(tmp_path / "a" / "checkpoint" / "000004.pt")
    assert step == 4
    assert tr2.ada_aug_p == pytest.approx(0.37)
    assert tr2.ada.ada_aug_p == pytest.approx(0.37)
    # and the first controller update starts FROM the restored p
    p = tr2.ada.tune(2.0 * tr2.ada.update_every, tr2.ada.update_every)
    assert abs(p - 0.37) < 0.01

    # isolate the G step: drive the unfused g piece directly with the SAME
    # G/D states and key, varying only ada_p — the update differs iff the
    # fake is augmented inside the generator loss
    tr = StyleGAN2Trainer(
        tmp_path / "iso", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1,
        batch_size=2, log_every=1, save_every=10000, augment_p=1.0,
        fuse_steps=False,
    )
    k = jax.random.key(3)
    g0, _, _ = tr._variant(False)["uf"]["g"](
        tr.g_state, tr.g_ema, tr.d_state.params, k, 0.0)
    tr2 = StyleGAN2Trainer(
        tmp_path / "iso2", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1,
        batch_size=2, log_every=1, save_every=10000, augment_p=1.0,
        fuse_steps=False,
    )
    g1, _, _ = tr2._variant(True)["uf"]["g"](
        tr2.g_state, tr2.g_ema, tr2.d_state.params, k, 1.0)
    assert any(
        float(jnp.abs(x - y).max()) > 1e-7
        for x, y in zip(jax.tree.leaves(g0.params), jax.tree.leaves(g1.params))
    ), "G update is insensitive to ada_p - fake not augmented in g_step"


@pytest.mark.slow
def test_stylegan2_trainer_data_parallel(tmp_path):
    """Full SG2 step programs under shard_map on the 8-device CPU mesh."""
    from diagan_tpu.parallel import make_mesh
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    mesh = make_mesh(jax.devices()[:8])
    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3), np.uint8)
    gen = StyleGAN2Generator(size=16)
    disc = StyleGAN2Discriminator(size=16)
    tr = StyleGAN2Trainer(tmp_path, gen, disc, imgs, num_steps=2,
                          batch_size=2, log_every=1, save_every=10000,
                          mesh=mesh)
    tr.train()
    assert int(tr.g_state.step) == 2
    leaf = jax.tree.leaves(tr.g_state.params)[0]
    assert bool(jnp.isfinite(leaf).all())


def test_bf16_compute_dtype_matches_fp32_structure():
    """bf16 compute dtype: params stay fp32, output returns fp32, values
    track the fp32 model (same params; loose tolerance for bf16 rounding),
    and the R1-style input gradient stays finite."""
    g32 = StyleGAN2Generator(size=16)
    g16 = StyleGAN2Generator(size=16, dtype=jnp.bfloat16)
    d16 = StyleGAN2Discriminator(size=16, dtype=jnp.bfloat16)
    k = jax.random.key(0)
    z = jax.random.normal(k, (4, 512))
    gv = g32.init({"params": k, "noise": k}, z)
    a = g32.apply(gv, z, rngs={"noise": k})
    b = g16.apply(gv, z, rngs={"noise": k})  # same fp32 params
    assert b.dtype == jnp.float32
    assert jax.tree.leaves(gv["params"])[0].dtype == jnp.float32
    assert float(jnp.mean(jnp.abs(a - b))) < 0.05
    dv = d16.init({"params": k}, a)

    def score(x):
        return jnp.sum(d16.apply(dv, x)[0])

    grad_x = jax.grad(score)(a)
    assert bool(jnp.isfinite(grad_x).all())


def test_trainer_logit_sweep_scatter(tmp_path):
    """The scanned full-dataset logit sweep returns per-example logits in
    dataset order, including the ragged final batch."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(1).integers(0, 255, (23, 16, 16, 3), np.uint8)
    gen = StyleGAN2Generator(size=16)
    disc = StyleGAN2Discriminator(size=16)
    tr = StyleGAN2Trainer(tmp_path, gen, disc, imgs, num_steps=1,
                          batch_size=2, log_every=1, save_every=10000)
    # batch must be a multiple of D's stddev_group (4) — true of the
    # reference too (rosinality model.py view(group, -1, ...))
    tr._record_logits(step=5, batch=8)
    out = tr.logit_results["netD_eval"][5]
    assert out.shape == (23,) and out.dtype == np.float64
    # oracle: same batching as the sweep (minibatch-stddev couples logits
    # within a batch), last batch padded with the final example
    idx = np.arange(24).clip(max=22)
    x = jnp.asarray(imgs[idx]).astype(jnp.float32) / 127.5 - 1.0
    want = np.concatenate([
        np.asarray(disc.apply({"params": tr.d_state.params}, x[s:s + 8])[0])
        for s in range(0, 24, 8)
    ])[:23]
    np.testing.assert_allclose(out, want.astype(np.float64), rtol=2e-4,
                               atol=1e-5)


@pytest.mark.slow
def test_stream_data_mode_trains_and_sweep_matches(tmp_path):
    """Host-streaming data mode (native sampler + threaded gather feeding
    per-chunk uint8 stacks): the trainer runs with R1 firing inside the
    chunk, and the slab logit sweep is bit-equal to the HBM sweep for the
    same params."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(2).integers(0, 255, (40, 16, 16, 3),
                                             np.uint8)
    weights = np.linspace(0.5, 2.0, 40)

    def build(stream, out):
        gen = StyleGAN2Generator(size=16)
        disc = StyleGAN2Discriminator(size=16)
        drs = StyleGAN2Discriminator(size=16)
        return StyleGAN2Trainer(
            out, gen, disc, imgs, num_steps=4, drs_disc=drs,
            sample_weights=weights, batch_size=4, log_every=2,
            d_reg_every=2, g_reg_every=3, save_every=10000, seed=0,
            stream_data=stream,
        )

    tr_hbm = build(False, tmp_path / "hbm")
    tr_str = build(True, tmp_path / "stream")
    assert tr_str.stream and not tr_hbm.stream

    # identical init (same seed) -> slab sweep must match device sweep
    tr_hbm._record_logits(step=0, batch=8)
    tr_str._record_logits(step=0, batch=8)
    np.testing.assert_allclose(
        tr_hbm.logit_results["netD_drs_eval"][0],
        tr_str.logit_results["netD_drs_eval"][0], atol=1e-5,
    )

    tr_str.train()
    assert int(tr_str.g_state.step) == 4
    for leaf in jax.tree.leaves(tr_str.g_state.params):
        assert bool(jnp.isfinite(leaf).all())
    for leaf in jax.tree.leaves(tr_str.d_state.params):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_remat_param_tree_and_gradient_parity():
    """remat=True (per-layer nn.remat, explicitly-named wrapped modules)
    must leave (1) the param tree byte-identical — same paths, same init
    values — and (2) first- AND second-order (R1-style) D gradients and
    G outputs numerically unchanged."""
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    d_plain = StyleGAN2Discriminator(size=16)
    d_remat = StyleGAN2Discriminator(size=16, remat=True)
    p0 = d_plain.init({"params": jax.random.key(1)}, x)["params"]
    p1 = d_remat.init({"params": jax.random.key(1)}, x)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def apply(d, p, x):
        out = d.apply({"params": p}, x)
        return out[0] if isinstance(out, tuple) else out

    def loss(d, p, x):
        return jnp.mean(jax.nn.softplus(-apply(d, p, x)))

    def r1(d, p, x):
        g = jax.grad(lambda xx: jnp.sum(apply(d, p, xx)))(x)
        return jnp.sum(g**2)

    g0 = jax.grad(loss, argnums=1)(d_plain, p0, x)
    g1 = jax.grad(loss, argnums=1)(d_remat, p0, x)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    r0 = jax.grad(r1, argnums=1)(d_plain, p0, x)
    r1g = jax.grad(r1, argnums=1)(d_remat, p0, x)
    for a, b in zip(jax.tree.leaves(r0), jax.tree.leaves(r1g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

    g_plain = StyleGAN2Generator(size=16)
    g_remat = StyleGAN2Generator(size=16, remat=True)
    z = jax.random.normal(jax.random.key(2), (2, 512))
    gv0 = g_plain.init({"params": jax.random.key(3), "noise": jax.random.key(4)}, z)
    gv1 = g_remat.init({"params": jax.random.key(3), "noise": jax.random.key(4)}, z)
    assert jax.tree_util.tree_structure(gv0) == jax.tree_util.tree_structure(gv1)
    y0 = g_plain.apply(gv0, z, rngs={"noise": jax.random.key(5)})
    y1 = g_remat.apply(gv0, z, rngs={"noise": jax.random.key(5)})
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_remat_trainer_smoke(tmp_path):
    """Full trainer on remat=True models: 2 steps (incl. the step-0 R1
    and path-reg grad-of-grad branches through nn.remat) stay finite."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3), np.uint8)
    tr = StyleGAN2Trainer(
        tmp_path, StyleGAN2Generator(size=16, remat=True),
        StyleGAN2Discriminator(size=16, remat=True),
        imgs, num_steps=2, batch_size=2, log_every=1, save_every=10000,
        seed=3,
    )
    tr.train()
    for leaf in jax.tree.leaves(tr.g_state.params) + jax.tree.leaves(
        tr.d_state.params
    ):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_unfused_steps_match_fused(tmp_path):
    """fuse_steps=False (per-piece dispatches for compile-limited large
    configs) must follow the same RNG stream and cadence as the fused
    scan: first-chunk metrics agree closely and training stays finite."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3), np.uint8)

    def make(fuse):
        return StyleGAN2Trainer(
            tmp_path / f"fuse{fuse}",
            StyleGAN2Generator(size=16), StyleGAN2Discriminator(size=16),
            imgs, num_steps=3, batch_size=2, log_every=1, save_every=10000,
            seed=3, fuse_steps=fuse,
        )

    a, b = make(True), make(False)
    key = jax.random.key(9)
    # one fused 2-step chunk vs the unfused runner with the same key
    chunk = a._make_chunk(2)
    (_, _, _, _, _, ms_f) = chunk(
        a.g_state, a.d_state, a.d_drs_state, a.g_ema, a.pl_mean, key,
        a.ada_aug_p, jnp.int32(0), a.images,
    )
    ms_u = b._run_unfused(key, 0, 2)
    # step 0 fires both regularizers in each path; d metrics of step 0
    # involve no optimizer state so they should agree tightly
    for k in ("d", "real_score", "fake_score", "r1"):
        np.testing.assert_allclose(
            np.asarray(ms_f[k])[0], ms_u[k][0], rtol=2e-4, atol=2e-4,
            err_msg=k,
        )
    # both paths fired r1/path only at step 0 of (0, 1)
    assert ms_u["r1"][0] != 0.0 and ms_u["r1"][1] == 0.0
    assert ms_u["path"][0] != 0.0 and ms_u["path"][1] == 0.0
    b2 = make(False)
    b2.train()
    for leaf in jax.tree.leaves(b2.g_state.params) + jax.tree.leaves(
        b2.d_state.params
    ):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_unfused_stream_smoke(tmp_path):
    """fuse_steps=False composes with host-streamed data (the realistic
    large-config path: full FFHQ at 1024px cannot live in HBM): per-step
    host-gathered uint8 batches feed the per-piece programs, training
    runs the full cadence, and params stay finite."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3),
                                             np.uint8)
    w = np.linspace(0.5, 2.0, 64)
    tr = StyleGAN2Trainer(
        tmp_path / "ufs",
        StyleGAN2Generator(size=16), StyleGAN2Discriminator(size=16),
        imgs, num_steps=3, batch_size=2, log_every=1, save_every=10000,
        seed=3, fuse_steps=False, stream_data=True, sample_weights=w,
        drs_disc=StyleGAN2Discriminator(size=16),
    )
    assert tr.stream and not tr.fuse
    tr.train()
    for leaf in jax.tree.leaves(tr.g_state.params) + jax.tree.leaves(
        tr.d_state.params
    ) + jax.tree.leaves(tr.d_drs_state.params):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_stream_data_parallel_mesh(tmp_path):
    """stream_data composes with the data-parallel mesh: the host gathers
    GLOBAL (bs x devices) uint8 stacks, shard_map splits them over the data
    axis, and the single global weighted stream survives sharding (the
    reference dropped sampler weights under DDP, train_ffhq_phase2.py:35-45).
    States stay replicated and finite."""
    from diagan_tpu.parallel import make_mesh
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    mesh = make_mesh(jax.devices()[:4])
    imgs = np.random.default_rng(0).integers(0, 255, (64, 16, 16, 3),
                                             np.uint8)
    w = np.linspace(0.5, 2.0, 64)
    tr = StyleGAN2Trainer(
        tmp_path / "smesh",
        StyleGAN2Generator(size=16), StyleGAN2Discriminator(size=16),
        imgs, num_steps=2, batch_size=2, log_every=1, save_every=10000,
        seed=5, stream_data=True, sample_weights=w, mesh=mesh,
        drs_disc=StyleGAN2Discriminator(size=16),
    )
    assert tr.stream and tr.mesh is not None and tr._mesh_n == 4
    xs, r1 = tr._host_stacks(0, 2)
    assert xs["d"].shape == (2, 8, 16, 16, 3)  # global = 2 steps x (2x4)
    tr.train()
    assert int(tr.g_state.step) == 2
    for leaf in jax.tree.leaves(tr.g_state.params) + jax.tree.leaves(
        tr.d_state.params
    ) + jax.tree.leaves(tr.d_drs_state.params):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.slow
def test_resume_restores_optimizer_state_bitwise(tmp_path):
    """Resume must restore Adam moments (the reference restores
    g_optim/d_optim, train_ffhq.py:560-566). Zeroed moments on resume are
    an effective-LR shock: a long 256px hardware run visibly changed
    dynamics at the first post-resume chunk and settled degenerate
    (docs/VALIDATION.md round 3). Pin: train 2+2 steps through a
    save/load cycle == train 4 steps straight, bitwise."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), np.uint8)

    def make(out, num_steps):
        return StyleGAN2Trainer(
            tmp_path / out, StyleGAN2Generator(size=16),
            StyleGAN2Discriminator(size=16), imgs, num_steps=num_steps,
            batch_size=2, log_every=2, save_every=2, seed=3,
            augment_p=0.0,
        )

    straight = make("straight", 4)
    straight.train(start_step=0)

    part1 = make("resumed", 2)
    part1.train(start_step=0)
    part2 = make("resumed2", 4)
    step = part2.load_ckpt(tmp_path / "resumed" / "checkpoint" / "000002.pt")
    assert step == 2
    # moments actually came back (non-zero after 2 Adam updates)
    mu = jax.tree.leaves(part2.g_state.opt_state)
    assert any(np.any(np.asarray(x) != 0) for x in mu if hasattr(x, "shape"))
    part2.train(start_step=2)

    for name, a, b in (
        ("g", straight.g_state.params, part2.g_state.params),
        ("d", straight.d_state.params, part2.d_state.params),
        ("g_ema", straight.g_ema, part2.g_ema),
        ("g_opt", straight.g_state.opt_state, part2.g_state.opt_state),
        ("d_opt", straight.d_state.opt_state, part2.d_state.opt_state),
    ):
        la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(la) == len(lb), name
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb), err_msg=name)


def test_read_stylegan2_ckpt_standalone(tmp_path, monkeypatch):
    """Eval loads {iter:06d}.pt through a standalone reader: no trainer
    construction, no optimizer build, no /tmp side-effect directories
    (the old path instantiated a throwaway StyleGAN2Trainer("/tmp/_sg2_eval")
    just to reuse load_ckpt)."""
    from diagan_tpu.eval.evaluate import read_stylegan2_ckpt
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (8, 16, 16, 3), np.uint8)
    gen = StyleGAN2Generator(size=16)
    disc = StyleGAN2Discriminator(size=16)
    drs_disc = StyleGAN2Discriminator(size=16)
    tr = StyleGAN2Trainer(
        tmp_path / "run", gen, disc, imgs, num_steps=1, batch_size=2,
        log_every=1, save_every=1, drs_disc=drs_disc,
    )
    tr.train()
    path = tmp_path / "run" / "checkpoint" / "000001.pt"
    assert path.is_file()

    # reading must not construct a trainer (the old side-effectful hack)
    def _boom(*a, **k):
        raise AssertionError("reader constructed a StyleGAN2Trainer")

    monkeypatch.setattr(StyleGAN2Trainer, "__init__", _boom)
    loaded = read_stylegan2_ckpt(path, gen, disc=drs_disc, use_drs=True)
    monkeypatch.undo()
    for got, want in (
        (loaded["g_ema"], tr.g_ema),
        (loaded["drs_d"], tr.d_drs_state.params),
    ):
        la, lb = jax.tree.leaves(got), jax.tree.leaves(want)
        assert len(la) == len(lb)
        for xa, xb in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # drs_d falls back to d when the checkpoint has none
    # (reference train_ffhq_phase2.py:605-610)
    tr2 = StyleGAN2Trainer(
        tmp_path / "p1", gen, disc, imgs, num_steps=1, batch_size=2,
        log_every=1, save_every=1,
    )
    tr2.train()
    loaded = read_stylegan2_ckpt(
        tmp_path / "p1" / "checkpoint" / "000001.pt", gen, disc=drs_disc,
        use_drs=True,
    )
    for xa, xb in zip(jax.tree.leaves(loaded["drs_d"]),
                      jax.tree.leaves(tr2.d_state.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_dispatch_envelope_auto_sizing(tmp_path):
    """The dispatch-envelope sizing rule (VERDICT r3 item 3): with no
    --max_chunk the trainer bootstraps at _BOOT_CHUNK, calibrates the cap
    from a timed dispatch to <= TARGET_DISPATCH_S of device time, only
    shrinks after the first calibration, and an explicit max_chunk
    overrides everything."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (8, 16, 16, 3), np.uint8)
    tr = StyleGAN2Trainer(
        tmp_path / "a", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1000,
        batch_size=2, log_every=1000, save_every=10000,
    )
    boot = StyleGAN2Trainer._BOOT_CHUNK
    # bootstrap: no measurement yet -> cap at _BOOT_CHUNK
    assert tr._next_boundary(0) == boot
    # first call of a program (compile) never calibrates
    tr._observe_chunk(boot, 300.0, first_call=True)
    assert tr._chunk_cap is None
    # 1 s/step -> largest ladder rung under 30s is 25
    tr._observe_chunk(boot, boot * 1.0, first_call=False)
    assert tr._chunk_cap == 25
    assert tr._next_boundary(0) == 25
    # growth after calibration is ignored (would churn compiled programs)
    tr._observe_chunk(25, 25 * 0.01, first_call=False)
    assert tr._chunk_cap == 25
    # but a long-running dispatch shrinks the cap below the observed n
    tr._observe_chunk(25, 50.0, first_call=False)
    assert tr._chunk_cap <= 12
    # very slow steps -> cap below the ladder floor
    tr2 = StyleGAN2Trainer(
        tmp_path / "b", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1000,
        batch_size=2, log_every=1000, save_every=10000,
    )
    tr2._observe_chunk(boot, boot * 10.0, first_call=False)  # 10 s/step
    assert tr2._chunk_cap == 3
    # explicit max_chunk wins over auto
    tr3 = StyleGAN2Trainer(
        tmp_path / "c", StyleGAN2Generator(size=16),
        StyleGAN2Discriminator(size=16), imgs, num_steps=1000,
        batch_size=2, log_every=1000, save_every=10000, max_chunk=7,
    )
    tr3._observe_chunk(7, 7 * 1.0, first_call=False)
    assert tr3._chunk_cap is None
    assert tr3._next_boundary(0) == 7


@pytest.mark.slow
def test_chunking_invariant_rng(tmp_path):
    """Per-step RNG keying: splitting the same run into different dispatch
    chunk sizes must produce bitwise-identical parameters — the invariant
    that makes envelope auto-sizing safe."""
    from diagan_tpu.train.stylegan2_trainer import StyleGAN2Trainer

    imgs = np.random.default_rng(0).integers(0, 255, (16, 16, 16, 3), np.uint8)

    def run(out, max_chunk):
        tr = StyleGAN2Trainer(
            tmp_path / out, StyleGAN2Generator(size=16),
            StyleGAN2Discriminator(size=16), imgs, num_steps=4,
            batch_size=2, log_every=4, save_every=10000, seed=3,
            max_chunk=max_chunk,
        )
        tr.train()
        return tr

    a = run("chunk1", 1)
    b = run("chunk4", 4)
    for name, x, y in (
        ("g", a.g_state.params, b.g_state.params),
        ("d", a.d_state.params, b.d_state.params),
        ("g_ema", a.g_ema, b.g_ema),
    ):
        for xa, xb in zip(jax.tree.leaves(x), jax.tree.leaves(y)):
            np.testing.assert_array_equal(
                np.asarray(xa), np.asarray(xb), err_msg=name)


def test_fold_blur_matches_unfolded(monkeypatch):
    """The blur-fold (blur folded into the adjacent MXU conv kernel,
    models/stylegan2.py _fold_kernel; reference stylegan2/model.py wraps
    every stride-2 conv in a separate upfirdn2d) is numerically the same
    model: identical param tree, outputs equal to fp32 reassociation
    error, for both G (conv-transpose fold + crop) and D (pad + strided
    conv fold)."""
    G = StyleGAN2Generator(size=32)
    D = StyleGAN2Discriminator(size=32)
    k = jax.random.key(0)
    z = jax.random.normal(jax.random.key(1), (2, 512))
    x = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))

    monkeypatch.setenv("DIAGAN_TPU_FOLD_BLUR", "0")
    gv = G.init({"params": k, "noise": k}, z)
    dv = D.init({"params": k}, x)
    img_ref = G.apply(gv, z, rngs={"noise": k})
    d_ref, _ = D.apply(dv, x)

    monkeypatch.setenv("DIAGAN_TPU_FOLD_BLUR", "1")
    gv2 = G.init({"params": k, "noise": k}, z)
    assert jax.tree_util.tree_structure(gv2) == \
        jax.tree_util.tree_structure(gv)
    img = G.apply(gv, z, rngs={"noise": k})
    d_out, _ = D.apply(dv, x)

    np.testing.assert_allclose(np.asarray(img), np.asarray(img_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref),
                               atol=1e-4, rtol=1e-4)

    # gradients agree too (the fold is linear in the kernel param)
    def g_loss(p, params):
        monkeypatch.setenv("DIAGAN_TPU_FOLD_BLUR", p)
        out = G.apply({"params": params}, z, rngs={"noise": k})
        return jnp.mean(out**2)

    g0 = jax.grad(lambda p: g_loss("0", p))(gv["params"])
    g1 = jax.grad(lambda p: g_loss("1", p))(gv["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-3)


def test_fold_blur_backend_default(monkeypatch):
    """The blur-fold defaults OFF on the cpu backend (an MXU trade that
    runs 2x slower through XLA-CPU's conv path) and the env var overrides
    both ways (models/stylegan2.py _fold_blur_enabled)."""
    from diagan_tpu.models.stylegan2 import _fold_blur_enabled

    monkeypatch.delenv("DIAGAN_TPU_FOLD_BLUR", raising=False)
    assert jax.default_backend() == "cpu"  # test tier runs the CPU mesh
    assert _fold_blur_enabled() is False
    monkeypatch.setenv("DIAGAN_TPU_FOLD_BLUR", "1")
    assert _fold_blur_enabled() is True
    monkeypatch.setenv("DIAGAN_TPU_FOLD_BLUR", "0")
    assert _fold_blur_enabled() is False


def test_width_scale_narrows_channels():
    """width_scale (the dryrun/test knob) narrows every stage uniformly
    with an 8-channel floor and leaves the module structure (param tree
    keys) identical to the full-width model."""
    from diagan_tpu.models.stylegan2 import _channels

    full = _channels(16)
    narrow = _channels(16, width_scale=0.125)
    assert narrow == {k: max(8, v // 8) for k, v in full.items()}

    k = jax.random.key(0)
    g = StyleGAN2Generator(size=16, style_dim=64, n_mlp=2, width_scale=0.125)
    d = StyleGAN2Discriminator(size=16, width_scale=0.125)
    z = jnp.zeros((2, 64))
    gv = g.init({"params": k, "noise": k}, z)
    img = g.apply(gv, z, rngs={"noise": k})
    assert img.shape == (2, 16, 16, 3)
    logits, _ = d.apply(d.init({"params": k}, img), img)
    assert logits.shape == (2,)

    g_full = StyleGAN2Generator(size=16, style_dim=64, n_mlp=2)
    gv_full = jax.eval_shape(
        lambda: g_full.init({"params": k, "noise": k}, z))
    assert (jax.tree_util.tree_structure(gv_full)
            == jax.tree_util.tree_structure(gv))

"""CAE reconstruction-error evaluation protocol (Colored-MNIST/MNIST-FMNIST).

Parity with reference train_cae.py / eval_ae_score.py:
  1. generate 50k images from (DRS-wrapped) G -> uint8 pickle
     (train_cae.py:96-110),
  2. train a CAE on the generated data (MSE, Adam eps=1e-7 wd=5e-4,
     batch 128; train_cae.py:44-47),
  3. after every epoch, record each REAL example's reconstruction error
     RE = ||x_hat - x||_2 / 32 scattered by index (train_cae.py:27-41),
     giving `cae_training_loss.npy` of shape [N, epochs],
  4. eval_ae_score compares last-epoch RE of baseline vs resampled run over
     all and minority indices -> %% difference (eval_ae_score.py:32-78).

TPU-native: CAE epochs are one jitted lax.scan over shuffled minibatches;
the per-real-example RE sweep reuses the static-shape masked-batch pattern
from the logit recorder.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diagan_tpu.data.pipeline import full_sweep_index_batches


def make_cae_tx(lr=1e-3, eps=1e-7, weight_decay=5e-4):
    # torch Adam(weight_decay=..) = L2 added to the grad BEFORE the moments
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, eps=eps),
    )


def generate_dataset(generate_images_fn, save_path, num_images=50000,
                     step_data=1000):
    """Sample `num_images` from G (plain or DRS) into a uint8 pickle."""
    import pickle

    # one request: the samplers already chunk internally at the right
    # dispatch grain, and a DRS over-request would discard its per-call
    # accepted surplus (step_data kept in the signature for parity with
    # reference train_cae.py:96-110)
    del step_data
    try:
        # samplers that can quantize on device (4x smaller transfer over
        # the slow device->host link) do so
        arr = np.asarray(generate_images_fn(num_images, return_uint8=True))
    except TypeError:
        arr = np.asarray(generate_images_fn(num_images))
    if arr.dtype != np.uint8:
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
    arr = arr[:num_images]
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    with open(save_path, "wb") as f:
        pickle.dump(arr, f)
    return arr


def train_cae(cae, generated_images, real_images, save_path, epochs=100,
              batch_size=128, seed=0, norm_div=32.0, model_save_epochs=50):
    """Returns RE matrix [N_real, epochs]; writes cae_training_loss.npy."""
    save_path = Path(save_path)
    save_path.mkdir(parents=True, exist_ok=True)

    gen = jnp.asarray(generated_images)
    real = jnp.asarray(real_images)
    quant_gen = generated_images.dtype == np.uint8
    quant_real = real_images.dtype == np.uint8
    n_gen = len(generated_images)
    n_real = len(real_images)
    steps_per_epoch = n_gen // batch_size

    tx = make_cae_tx()
    variables = cae.init(jax.random.key(seed), jnp.asarray(real_images[:2],
                         jnp.float32), train=True)
    params = variables.pop("params")
    state = variables
    opt_state = tx.init(params)

    def deq(x, quant):
        return x.astype(jnp.float32) / 127.5 - 1.0 if quant else x

    @jax.jit
    def epoch_fn(params, state, opt_state, perm, gen):
        # dataset as ARGUMENT, not closure (HLO-constant embedding)
        def body(carry, idx):
            params, state, opt_state = carry
            batch = deq(jnp.take(gen, idx, axis=0), quant_gen)

            def loss_fn(p):
                out, new_state = cae.apply(
                    {"params": p, **state}, batch, train=True,
                    mutable=list(state.keys()),
                )
                return jnp.mean((out - batch) ** 2), new_state

            (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), loss

        idxs = perm[: steps_per_epoch * batch_size].reshape(
            steps_per_epoch, batch_size
        )
        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), idxs
        )
        return params, state, opt_state, jnp.mean(losses)

    sweep_idx, sweep_mask = full_sweep_index_batches(n_real, 256)
    sweep_idx_j, sweep_mask_j = jnp.asarray(sweep_idx), jnp.asarray(sweep_mask)

    @jax.jit
    def re_sweep(params, state, real):
        def body(buf, xs):
            idx, mask = xs
            batch = deq(jnp.take(real, idx, axis=0), quant_real)
            out = cae.apply({"params": params, **state}, batch, train=False)
            re = jnp.sqrt(jnp.sum((out - batch) ** 2, axis=tuple(range(1, batch.ndim)))) / norm_div
            idx_eff = jnp.where(mask, idx, n_real)
            return buf.at[idx_eff].set(re, mode="drop"), None

        buf, _ = jax.lax.scan(
            body, jnp.zeros((n_real,), jnp.float32), (sweep_idx_j, sweep_mask_j)
        )
        return buf

    rng = np.random.default_rng(seed)
    re_epochs = []
    for epoch in range(1, epochs + 1):
        perm = jnp.asarray(rng.permutation(n_gen))
        params, state, opt_state, loss = epoch_fn(params, state, opt_state,
                                                   perm, gen)
        re = np.asarray(re_sweep(params, state, real))
        re_epochs.append(re)
        print(f"Epoch: [{epoch} | {epochs}], loss: {float(loss):.6f}")
        if epoch % model_save_epochs == 0:
            from flax import serialization

            with open(save_path / f"cae_epoch-{epoch}.pth", "wb") as f:
                f.write(serialization.to_bytes(
                    {"params": jax.device_get(params), **jax.device_get(state)}
                ))

    loss_epoch_arr = np.stack(re_epochs, axis=1)  # [N, epochs]
    np.save(save_path / "cae_training_loss.npy", loss_epoch_arr)
    return loss_epoch_arr


def eval_ae_score(baseline_loss_npy, resampled_loss_npy, minority_mask):
    """%% RE improvement of resampled vs baseline, over all and minority
    examples (eval_ae_score.py:32-78). Lower RE is better."""
    base = np.load(baseline_loss_npy)[:, -1]
    res = np.load(resampled_loss_npy)[:, -1]
    minority_mask = np.asarray(minority_mask, bool)
    out = {}
    for name, sel in (("all", np.ones_like(minority_mask)), ("minority", minority_mask)):
        b, r = base[sel].mean(), res[sel].mean()
        out[name] = {
            "baseline": float(b),
            "resampled": float(r),
            "pct_diff": float((r - b) / b * 100.0),
        }
    return out

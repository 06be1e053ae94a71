"""Generic jitted classifier training (bias probes, attribute classifier).

Replaces the torch train/validate loops shared by
train_color_mnist_feature.py, train_mnist_fmnist_feature.py and
train_convnet_celeba.py: Adam(1e-3) with MultiStep 0.1 decay at 3/7 and
6/7 of the epochs, cross-entropy (or per-attribute BCE), top-1 accuracy.
Each epoch is one jitted lax.scan over shuffled minibatches.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax


def multistep_lr(base_lr, epochs, steps_per_epoch, gamma=0.1):
    b1 = (epochs * 3 // 7) * steps_per_epoch
    b2 = (epochs * 6 // 7) * steps_per_epoch
    return optax.piecewise_constant_schedule(base_lr, {b1: gamma, b2: gamma})


def train_classifier(model, images, labels, epochs=80, batch_size=128,
                     lr=1e-3, seed=1, multilabel=False, ckpt_path=None,
                     ckpt_every=10):
    """images: uint8 NHWC; labels: int64 [N] (or {-1,+1} [N, A] when
    multilabel). Returns (params, state, history)."""
    n = len(images)
    steps_per_epoch = max(1, n // batch_size)
    tx = optax.adam(multistep_lr(lr, epochs, steps_per_epoch))
    imgs = jnp.asarray(images)
    labs = jnp.asarray(labels)

    x0 = jnp.zeros((2,) + images.shape[1:], jnp.float32)
    variables = model.init({"params": jax.random.key(seed),
                            "dropout": jax.random.key(seed + 1)}, x0, train=True)
    params = variables.pop("params")
    state = variables
    opt_state = tx.init(params)
    drop_key = jax.random.key(seed + 2)

    @jax.jit
    def epoch_fn(params, state, opt_state, perm, imgs, labs):
        # dataset passed as ARGUMENTS: closing over device arrays embeds
        # them as HLO constants (slow serialization to the remote compile
        # service; 413 at FFHQ scale — see stylegan2_trainer.py)
        def body(carry, idx):
            params, state, opt_state = carry
            x = jnp.take(imgs, idx, axis=0).astype(jnp.float32) / 127.5 - 1.0
            y = jnp.take(labs, idx, axis=0)

            def loss_fn(p):
                (logits, _), new_state = model.apply(
                    {"params": p, **state}, x, train=True,
                    mutable=list(state.keys()), rngs={"dropout": drop_key},
                )
                if multilabel:
                    targets = (y > 0).astype(jnp.float32)
                    loss = jnp.mean(
                        optax.sigmoid_binary_cross_entropy(logits, targets)
                    )
                    acc = jnp.mean(((logits > 0) == (y > 0)).astype(jnp.float32))
                else:
                    loss = jnp.mean(
                        optax.softmax_cross_entropy_with_integer_labels(logits, y)
                    )
                    acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
                return loss, (new_state, acc)

            (loss, (new_state, acc)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_state, opt_state), (loss, acc)

        idxs = perm[: steps_per_epoch * batch_size].reshape(
            steps_per_epoch, batch_size
        )
        (params, state, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, state, opt_state), idxs
        )
        return params, state, opt_state, jnp.mean(losses), jnp.mean(accs)

    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(1, epochs + 1):
        perm = jnp.asarray(rng.permutation(n))
        params, state, opt_state, loss, acc = epoch_fn(
            params, state, opt_state, perm, imgs, labs
        )
        history.append({"epoch": epoch, "loss": float(loss), "acc": float(acc)})
        print(f"[{epoch} / {epochs}] train_acc: {float(acc) * 100:.2f}")
        if ckpt_path and epoch % ckpt_every == 0:
            from flax import serialization

            ckpt_path = Path(ckpt_path)
            ckpt_path.mkdir(parents=True, exist_ok=True)
            with open(ckpt_path / f"ckpt_{epoch}.pt", "wb") as f:
                f.write(serialization.to_bytes(
                    {"params": jax.device_get(params), **jax.device_get(state)}
                ))
    return params, state, history


def predict_classifier(model, params, state, images, batch_size=256,
                       seed=0):
    """Batched eval-mode logits for uint8 NHWC images.

    All batches run as one scanned dispatch per <=1GB slab (uint8 crosses
    the host->device link; dequantize on device) — per-batch dispatches
    cost ~0.8s each on the tunneled TPU platform."""
    drop_key = jax.random.key(seed)

    @jax.jit
    def fwd_scan(batches):
        def body(_, x):
            x = x.astype(jnp.float32) / 127.5 - 1.0
            logits, _ = model.apply(
                {"params": params, **state}, x, train=False,
                rngs={"dropout": drop_key},
            )
            return None, logits

        return jax.lax.scan(body, None, batches)[1]

    images = np.asarray(images)
    n = len(images)
    img_bytes = int(np.prod(images.shape[1:])) * images.dtype.itemsize
    slab_batches = max(1, (2**30 // max(img_bytes, 1)) // batch_size)
    out = []
    for s in range(0, n, slab_batches * batch_size):
        slab = images[s : s + slab_batches * batch_size]
        k = len(slab)
        pad = (-k) % batch_size
        if pad:
            # NB: np.zeros_like(slab[:pad]) would silently truncate when
            # pad > k (slab smaller than one batch)
            slab = np.concatenate(
                [slab, np.zeros((pad,) + slab.shape[1:], slab.dtype)]
            )
        slab = jnp.asarray(slab).reshape((-1, batch_size) + slab.shape[1:])
        logits = fwd_scan(slab)
        out.append(np.asarray(logits).reshape(-1, logits.shape[-1])[:k])
    return np.concatenate(out)[:n]

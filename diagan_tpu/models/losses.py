"""GAN loss library.

Pure jnp functions over logits. Covers the loss surface the reference uses:
hinge / non-saturating (ns) / original minimax / wasserstein from
torch-mimicry, the GOLD-reweighted discriminator variants (reference
diagan-pkg/diagan/models/gold_reweight_models.py:10-61), top-k generator
filtering (topk_models.py:15-38), and the StyleGAN2 regularizers (logistic
losses, R1, path-length — reference stylegan2/train_ffhq.py:67-102).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    # numerically stable BCE-with-logits, elementwise
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


# ---- discriminator losses ------------------------------------------------

def hinge_loss_dis(output_fake, output_real):
    return jnp.mean(nn_relu(1.0 - output_real)) + jnp.mean(nn_relu(1.0 + output_fake))


def minimax_loss_dis(output_fake, output_real, real_label_val=1.0, fake_label_val=0.0):
    errf = jnp.mean(_bce_with_logits(output_fake, fake_label_val))
    errr = jnp.mean(_bce_with_logits(output_real, real_label_val))
    return errr + errf


def wasserstein_loss_dis(output_fake, output_real):
    return jnp.mean(output_fake) - jnp.mean(output_real)


# ---- generator losses ----------------------------------------------------

def hinge_loss_gen(output_fake):
    return -jnp.mean(output_fake)


def minimax_loss_gen(output_fake, real_label_val=1.0):
    # mimicry's 'ns' generator loss: BCE(fake, real_label)
    return jnp.mean(_bce_with_logits(output_fake, real_label_val))


def wasserstein_loss_gen(output_fake):
    return -jnp.mean(output_fake)


# ---- GOLD reweighting (discriminator-side) -------------------------------

def compute_gold_reweight(output_fake, d=1):
    """fake_weights = stop_grad(output_fake ** d) (reference
    gold_reweight_models.py:10-13). Note: logits, not probabilities — the
    reference applies the raw logit as the weight; preserved as-is."""
    return jax.lax.stop_gradient(output_fake**d)


def gold_reweighted_minimax_loss_dis(output_fake, output_real,
                                     real_label_val=1.0, fake_label_val=0.0):
    w = compute_gold_reweight(output_fake)
    errf = jnp.mean(w.reshape(-1) * _bce_with_logits(output_fake, fake_label_val).reshape(-1))
    errr = jnp.mean(_bce_with_logits(output_real, real_label_val))
    return errr + errf


def gold_reweighted_hinge_loss_dis(output_fake, output_real):
    w = compute_gold_reweight(output_fake)
    fake_term = jnp.mean(w.reshape(-1) * nn_relu(1.0 + output_fake).reshape(-1))
    return jnp.mean(nn_relu(1.0 - output_real)) + fake_term


# ---- top-k generator filtering ------------------------------------------

def topk_filter(output_fake, topk_rate):
    """Keep the top ceil(rate*N) fake logits, replicating the reference's
    torch.topk selection (topk_models.py:29-37) — but jit-friendly: a
    descending sort + static-size mask instead of a dynamic k.

    topk_rate may be a traced scalar; output is (sorted logits, weight mask)
    so the caller computes mean(loss * mask) / mean(mask)."""
    n = output_fake.shape[0]
    sorted_logits = jnp.sort(output_fake.reshape(-1))[::-1]
    k = jnp.floor(topk_rate * n).astype(jnp.int32)
    mask = (jnp.arange(n) < k).astype(sorted_logits.dtype)
    return sorted_logits, mask


def topk_rate_at(step, epoch_steps, decay_rate=0.99, min_rate=0.5):
    """rate = max(0.99 ** (step // epoch_steps), 0.5) (topk_models.py:22-28)."""
    epoch = step // epoch_steps
    return jnp.maximum(decay_rate**epoch, min_rate)


def masked_gen_loss(loss_type, sorted_logits, mask):
    """Generator loss over the top-k masked logit set."""
    if loss_type == "hinge":
        per = -sorted_logits
    elif loss_type in ("ns", "minimax"):
        per = _bce_with_logits(sorted_logits, 1.0)
    elif loss_type == "wasserstein":
        per = -sorted_logits
    else:
        raise ValueError(loss_type)
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


# ---- StyleGAN2 losses ----------------------------------------------------

def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real) + softplus(fake) (reference train_ffhq.py:67-73)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred):
    return jnp.mean(jax.nn.softplus(-fake_pred))


def r1_penalty(disc_fn, params, real):
    """R1 gradient penalty: E[||grad_x D(x)||^2] (train_ffhq.py:74-80)."""
    def score(x):
        return jnp.sum(disc_fn(params, x))

    grads = jax.grad(score)(real)
    return jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=-1))


def path_length_penalty(gen_latent_fn, params, latents, key, pl_mean):
    """Path-length regularization (train_ffhq.py:89-102). Returns
    (penalty, path_lengths, new_pl_mean)."""
    def gen_img(lat):
        return gen_latent_fn(params, lat)

    imgs, jvp_fn = jax.vjp(gen_img, latents)
    n, h, w, c = imgs.shape
    noise = jax.random.normal(key, imgs.shape) / jnp.sqrt(h * w)
    (grads,) = jvp_fn(noise)
    lengths = jnp.sqrt(jnp.sum(grads.reshape(n, -1) ** 2, axis=-1) + 1e-12)
    new_mean = pl_mean + 0.01 * (jnp.mean(lengths) - pl_mean)
    penalty = jnp.mean((lengths - new_mean) ** 2)
    return penalty, lengths, new_mean


# ---- SSGAN rotation self-supervision ------------------------------------

def rotate_batch_4way(x):
    """Stack [x, rot90, rot180, rot270] along batch. NHWC; returns
    (4N images, labels int32 4N)."""
    n = x.shape[0]
    r90 = jnp.rot90(x, k=1, axes=(1, 2))
    r180 = jnp.rot90(x, k=2, axes=(1, 2))
    r270 = jnp.rot90(x, k=3, axes=(1, 2))
    imgs = jnp.concatenate([x, r90, r180, r270], axis=0)
    labels = jnp.repeat(jnp.arange(4, dtype=jnp.int32), n)
    return imgs, labels


def ss_rotation_loss(rot_logits, rot_labels):
    """4-way softmax cross-entropy."""
    logp = jax.nn.log_softmax(rot_logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, rot_labels[:, None], axis=-1))


# ---- InfoMax local-global InfoNCE ---------------------------------------

def infonce_loss(local_feat, global_feat):
    """Local-global InfoNCE mutual-information loss (InfoMaxGAN).

    local_feat: (N, M, D) projected local features (M spatial positions);
    global_feat: (N, D) projected global features. Each (sample, position)
    pair is positive against its own global vector, negatives are other
    samples' global vectors.
    """
    n, m, d = local_feat.shape
    # (N, M, N) scores between each local position and every global vector
    scores = jnp.einsum("nmd,kd->nmk", local_feat, global_feat)
    labels = jnp.tile(jnp.arange(n)[:, None], (1, m))  # positive = own sample
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, :, None], axis=-1))


def nn_relu(x):
    return jnp.maximum(x, 0.0)


DIS_LOSSES = {
    "hinge": hinge_loss_dis,
    "ns": minimax_loss_dis,
    "minimax": minimax_loss_dis,
    "wasserstein": wasserstein_loss_dis,
}

GEN_LOSSES = {
    "hinge": hinge_loss_gen,
    "ns": minimax_loss_gen,
    "minimax": minimax_loss_gen,
    "wasserstein": wasserstein_loss_gen,
}

GOLD_DIS_LOSSES = {
    "hinge": gold_reweighted_hinge_loss_dis,
    "ns": gold_reweighted_minimax_loss_dis,
}

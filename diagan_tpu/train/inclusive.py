"""Inclusive GAN: nearest-latent reconstruction + interpolation losses.

Behavioral parity with reference
diagan-pkg/diagan/models/inclusive_gan.py:82-369:
  - all real train images embedded once through Inception (register_
    train_dataset_feats, :120-148),
  - every S = num_data/batch_size*20 steps, sample 10*num_data latents,
    embed G(z), and nearest-match each real example's features to a latent
    (:151-199, running-min over chunks),
  - G loss = advG + 10*reconsG + 4*itpG with sigma=0.05 latent noise,
    reconsG = mean feature distance of G(nearest_latent+noise) to the
    matched real features, itpG the alpha-interpolated variant (:249-342).

Reference quirk, fixed here: the reference embeds generated images through
a numpy-returning `get_activations`, which DETACHES the features — its
recons/itp terms carry no gradient to G (inclusive_gan.py:296-341). This
rebuild computes the features with the differentiable Flax Inception so
the inclusive losses actually train the generator; the loss weights and
schedule are unchanged.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diagan_tpu.eval.inception import InceptionFeaturizer
from diagan_tpu.train.trainer import LogTrainer

SIGMA = 0.05
LAMB = 10.0
BETA = 0.4 * LAMB


def _resize_for_inception(x):
    n = x.shape[0]
    x = jax.image.resize(x, (n, 299, 299, x.shape[-1]), "bilinear")
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    return x


class InclusiveTrainer(LogTrainer):
    """LogTrainer + the Inclusive-GAN generator-side auxiliary losses."""

    def __init__(self, *args, featurizer: InceptionFeaturizer | None = None,
                 refresh_multiplier: int = 20, latent_factor: int = 10,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.featurizer = featurizer or InceptionFeaturizer()
        self.refresh_every = max(
            1, self.num_data // self.batch_size * refresh_multiplier
        )
        self.latent_factor = latent_factor

        # one-time real-feature registration (reference :120-148)
        self.train_feats = jnp.asarray(
            self.featurizer.features(self.source.dataset.images)
        )
        incep_vars = self.featurizer.variables
        incep_model = self.featurizer.model
        nz = self.bundle.nz
        bs = self.batch_size
        num_data = self.num_data

        def incep_feats(x):
            pool3, _ = incep_model.apply(incep_vars, _resize_for_inception(x))
            return pool3

        def g_aux_loss(params, gen_fwd, rng, aux, metrics):
            train_feats, nearest_latent = aux
            k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
            idx1 = jax.random.randint(k1, (bs,), 0, num_data)
            idx2 = jax.random.randint(k2, (bs,), 0, num_data)
            feat1 = jnp.take(train_feats, idx1, axis=0)
            feat2 = jnp.take(train_feats, idx2, axis=0)
            nz1 = jnp.take(nearest_latent, idx1, axis=0) + SIGMA * \
                jax.random.normal(k3, (bs, nz))
            nz2 = jnp.take(nearest_latent, idx2, axis=0) + SIGMA * \
                jax.random.normal(k4, (bs, nz))
            gen1, _ = gen_fwd(params, self.g_state.state, nz1, rng, False)
            gen2, _ = gen_fwd(params, self.g_state.state, nz2, rng, False)
            f1 = incep_feats(gen1)
            f2 = incep_feats(gen2)
            recons = 0.5 * jnp.mean(
                jnp.linalg.norm(f1 - feat1, axis=-1)
                + jnp.linalg.norm(f2 - feat2, axis=-1)
            )
            alpha = jax.random.uniform(k5, (bs,))
            itp_z = alpha[:, None] * nz1 + (1 - alpha[:, None]) * nz2
            gen_itp, _ = gen_fwd(params, self.g_state.state, itp_z, rng, False)
            fi = incep_feats(gen_itp)
            itp = jnp.mean(
                alpha * jnp.linalg.norm(fi - feat1, axis=-1)
                + (1 - alpha) * jnp.linalg.norm(fi - feat2, axis=-1)
            )
            metrics["reconsG"] = recons
            metrics["itpG"] = itp
            return LAMB * recons + BETA * itp

        self.g_aux_loss = g_aux_loss
        self.fused_step = self._make_fused_step(g_aux_loss)
        self._chunks = {}
        self._refresh_jit = None
        self._refresh_nearest_latents()
        self.aux = (self.train_feats, self.nearest_latent)

    def _refresh_nearest_latents(self, chunk=500):
        """Sample latent_factor*N latents, embed G(z), running-min match each
        real example to its nearest latent (reference :151-199)."""
        nz = self.bundle.nz
        if self._refresh_jit is None:
            gen = self.bundle.gen
            incep_model = self.featurizer.model
            incep_vars = self.featurizer.variables
            train_feats = self.train_feats

            @jax.jit
            def score_chunk(g_params, g_state, z):
                imgs = gen.apply({"params": g_params, **g_state}, z, train=False)
                pool3, _ = incep_model.apply(incep_vars, _resize_for_inception(imgs))
                # squared distances real x latent-chunk
                d = (
                    jnp.sum(train_feats**2, 1)[:, None]
                    - 2 * train_feats @ pool3.T
                    + jnp.sum(pool3**2, 1)[None, :]
                )
                return jnp.min(d, axis=1), jnp.argmin(d, axis=1)

            self._refresh_jit = score_chunk

        key = jax.random.fold_in(self.key, 987 + self.global_step)
        num_latent = self.latent_factor * self.num_data
        best_d = np.full((self.num_data,), np.inf, np.float32)
        best_z = np.zeros((self.num_data, nz), np.float32)
        for start in range(0, num_latent, chunk):
            key, sub = jax.random.split(key)
            z = jax.random.normal(sub, (min(chunk, num_latent - start), nz))
            d, idx = self._refresh_jit(self.g_state.params, self.g_state.state, z)
            d, idx = np.asarray(d), np.asarray(idx)
            better = d < best_d
            best_d = np.where(better, d, best_d)
            best_z[better] = np.asarray(z)[idx[better]]
        self.nearest_latent = jnp.asarray(best_z)
        self.aux = (self.train_feats, self.nearest_latent)
        print(f"INFO: refreshed nearest latents (step {self.global_step})")

    def _next_boundary(self, step):
        nxt = super()._next_boundary(step)
        return min(nxt, (step // self.refresh_every + 1) * self.refresh_every)

    def train(self):
        # wrap the base loop: refresh nearest latents at S-step boundaries
        orig_chunk_fn = self._chunk_fn

        def chunk_fn(size):
            prog = orig_chunk_fn(size)

            def run(*args):
                step = int(np.asarray(args[7]))
                if step > 0 and step % self.refresh_every == 0:
                    self._refresh_nearest_latents()
                return prog(*args[:8], self.aux)

            return run

        self._chunk_fn = chunk_fn
        return super().train()

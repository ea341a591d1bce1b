"""ACTOR conditional transformer VAE — the generative baseline family.

Capability parity with the vendored ACTOR stack the reference carries for
baseline comparisons (reference: actor-x/src/models/modeltype/cvae.py +
architectures/transformer.py): a class-conditional motion VAE with learned
per-action distribution tokens (mu/sigma queries) on the encoder and a
duration-positional transformer decoder, trained with reconstruction + KL.

Kept intentionally compact: it is baseline machinery, not the CMDM runtime
path, but complete enough to train and sample from.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from regennet_tpu.models import transformer as tfm


class ActorCVAE(nn.Module):
    njoints: int
    nfeats: int
    num_actions: int
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @property
    def input_feats(self):
        return self.njoints * self.nfeats

    def setup(self):
        D = self.latent_dim
        self.skel_embedding = nn.Dense(D, name="skel_embedding")
        # learned per-action mu / sigma query tokens (ACTOR's trick)
        self.mu_query = self.param(
            "mu_query", nn.initializers.normal(0.02), (self.num_actions, D)
        )
        self.sigma_query = self.param(
            "sigma_query", nn.initializers.normal(0.02), (self.num_actions, D)
        )
        self.action_biases = self.param(
            "action_biases", nn.initializers.normal(0.02), (self.num_actions, D)
        )
        self.encoder = tfm.Encoder(
            self.num_layers, self.num_heads, D, self.ff_size, self.dropout,
            nn.gelu, self.dtype, name="encoder",
        )
        self.decoder = tfm.Decoder(
            self.num_layers, self.num_heads, D, self.ff_size, self.dropout,
            nn.gelu, self.dtype, name="decoder",
        )
        self.final_layer = nn.Dense(self.input_feats, name="final_layer")

    def encode(self, x, action, train=False):
        """x [B, J, F, T], action [B] -> (mu, logvar) [B, D]."""
        B, J, F, T = x.shape
        seq = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, T, J * F)
        h = self.skel_embedding(seq)
        mu_tok = self.mu_query[action][:, None, :]
        sigma_tok = self.sigma_query[action][:, None, :]
        h = jnp.concatenate([mu_tok, sigma_tok, h], axis=1)
        pos = tfm.sinusoidal_table(5000, self.latent_dim)
        h = h + pos[None, : h.shape[1]]
        out = self.encoder(h, None, deterministic=not train)
        return out[:, 0], out[:, 1]

    def decode(self, z, action, num_frames, train=False):
        """z [B, D], action [B] -> x_hat [B, J, F, T]."""
        B = z.shape[0]
        latent = z + self.action_biases[action]
        pos = tfm.sinusoidal_table(5000, self.latent_dim)
        queries = jnp.broadcast_to(
            pos[None, :num_frames], (B, num_frames, self.latent_dim)
        )
        out = self.decoder(
            queries, latent[:, None, :], None, deterministic=not train
        )
        out = self.final_layer(out)  # [B, T, J*F]
        return jnp.transpose(
            out.reshape(B, num_frames, self.njoints, self.nfeats), (0, 2, 3, 1)
        )

    def __call__(self, x, action, rng=None, train=False):
        mu, logvar = self.encode(x, action, train)
        if rng is None:
            z = mu
        else:
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, mu.shape)
        x_hat = self.decode(z, action, x.shape[-1], train)
        return {"output": x_hat, "mu": mu, "logvar": logvar, "z": z}

    def generate(self, variables, action, num_frames, rng):
        z = jax.random.normal(
            rng, (action.shape[0], self.latent_dim), jnp.float32
        )
        return self.apply(
            variables, z, action, num_frames, method=self.decode
        )


def cvae_losses(out: Dict, x: jnp.ndarray, mask=None,
                lambda_kl: float = 1e-5) -> Dict[str, jnp.ndarray]:
    """Reconstruction (masked MSE over frames) + KL toward N(0, I)."""
    diff = (out["output"] - x) ** 2
    if mask is not None:
        m = mask.astype(diff.dtype)
        rec = jnp.sum(diff * m) / jnp.maximum(
            jnp.sum(m) * x.shape[1] * x.shape[2], 1.0
        )
    else:
        rec = jnp.mean(diff)
    kl = -0.5 * jnp.mean(
        1 + out["logvar"] - out["mu"] ** 2 - jnp.exp(out["logvar"])
    )
    return {"rec": rec, "kl": kl, "loss": rec + lambda_kl * kl}

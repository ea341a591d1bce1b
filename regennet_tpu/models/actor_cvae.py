"""ACTOR conditional transformer VAE — the generative baseline family.

Capability parity with the vendored ACTOR stack the reference carries for
baseline comparisons (reference: actor-x/src/models/modeltype/cvae.py +
architectures/transformer.py): a class-conditional motion VAE with learned
per-action distribution tokens (mu/sigma queries) on the encoder and a
duration-positional transformer decoder, trained with reconstruction + KL.

Kept intentionally compact: it is baseline machinery, not the CMDM runtime
path, but complete enough to train and sample from.

`vae=False` gives the CAE modeltype (reference:
actor-x/src/models/modeltype/cae.py): the same encoder/decoder pair run as
a deterministic autoencoder — z is the encoder mean, no reparameterisation —
typically regularised with the mmd/hp losses from
regennet_tpu.models.actor_losses instead of KL.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from regennet_tpu.models import transformer as tfm


# encoder/decoder family per ARCHINAMES entry (reference:
# actor-x/src/models/get_model.py:8 + architectures/{grutrans,transgru}.py,
# which recombine the GRU and transformer halves)
ARCH_FAMILIES = {
    "transformer": ("transformer", "transformer"),
    "fc": ("fc", "fc"),
    "gru": ("gru", "gru"),
    "grutrans": ("gru", "transformer"),
    "transgru": ("transformer", "gru"),
    "autotrans": ("transformer", "autotrans"),
}


class JoeynmtDecoderLayer(nn.Module):
    """Pre-norm joeynmt transformer decoder layer — exact parity with the
    reference's vendored stack (actor-x/src/models/architectures/tools/
    transformer_layers.py:216-281):

        h1  = dropout(self_attn(LN(x))) + x
        h2  = cross_attn(q=LN(h1), k=v=memory)
        out = FF(dropout(h2) + h1)   with FF = LN -> Dense(ff) -> relu
                                     -> dropout -> Dense(D) -> dropout (+res)

    All LayerNorms use joeynmt's eps=1e-6. Attention numerics (separate
    q/k/v/out projections, 1/sqrt(head_dim) scaling, attention-prob
    dropout) are shared with tfm.MultiHeadAttention."""

    num_heads: int
    latent_dim: int
    ff_size: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, deterministic=True):
        xn = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="x_layer_norm"
        )(x)
        h1 = tfm.MultiHeadAttention(
            self.num_heads, self.latent_dim, self.dropout, self.dtype,
            name="trg_trg_att",
        )(xn, xn, tgt_mask, deterministic)
        h1 = nn.Dropout(self.dropout)(h1, deterministic=deterministic) + x
        h1n = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="dec_layer_norm"
        )(h1)
        h2 = tfm.MultiHeadAttention(
            self.num_heads, self.latent_dim, self.dropout, self.dtype,
            name="src_trg_att",
        )(h1n, memory, None, deterministic)
        ff_in = nn.Dropout(self.dropout)(h2, deterministic=deterministic) + h1
        ffn = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="ff_layer_norm"
        )(ff_in)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="pwff1")(ffn)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="pwff2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h + ff_in


class ActorCVAE(nn.Module):
    """arch selects the encoder/decoder family, mirroring the reference's
    ARCHINAMES (actor-x/src/models/get_model.py:8): 'transformer' (the
    paper architecture, learned per-action distribution tokens), 'fc'
    (flatten-everything MLP, architectures/fc.py), 'gru' (recurrent with
    one-hot + normalised-time channels, architectures/gru.py), the
    recombinations 'grutrans'/'transgru', and 'autotrans' (transformer
    encoder + teacher-forced autoregressive transformer decoder,
    architectures/autotrans.py:59-190). fc/gru use fixed-length windows
    (num_frames), matching this pipeline's samplers."""

    njoints: int
    nfeats: int
    num_actions: int
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    dropout: float = 0.1
    arch: str = "transformer"
    num_frames: int = 60
    num_gru_layers: int = 4
    vae: bool = True  # False = CAE modeltype (deterministic z)
    dtype: Any = jnp.float32

    @property
    def input_feats(self):
        return self.njoints * self.nfeats

    @property
    def enc_arch(self):
        return ARCH_FAMILIES[self.arch][0]

    @property
    def dec_arch(self):
        return ARCH_FAMILIES[self.arch][1]

    def setup(self):
        D = self.latent_dim
        # --- encoder family ---
        if self.enc_arch == "fc":
            # reference: architectures/fc.py:26-34
            self.enc_fc1 = nn.Dense(512, name="enc_fc1")
            self.enc_fc2 = nn.Dense(256, name="enc_fc2")
            self.enc_mu = nn.Dense(D, name="enc_mu")
            self.enc_var = nn.Dense(D, name="enc_var")
        elif self.enc_arch == "gru":
            # reference: architectures/gru.py:41-96
            self.enc_embed = nn.Dense(D, name="enc_embed")
            self.enc_grus = [
                nn.RNN(nn.GRUCell(features=D), name=f"enc_gru_{i}")
                for i in range(self.num_gru_layers)
            ]
            self.enc_mu = nn.Dense(D, name="enc_mu")
            self.enc_var = nn.Dense(D, name="enc_var")
        else:
            self.skel_embedding = nn.Dense(D, name="skel_embedding")
            # learned per-action mu / sigma query tokens (ACTOR's trick)
            self.mu_query = self.param(
                "mu_query", nn.initializers.normal(0.02), (self.num_actions, D)
            )
            self.sigma_query = self.param(
                "sigma_query", nn.initializers.normal(0.02),
                (self.num_actions, D),
            )
            self.encoder = tfm.Encoder(
                self.num_layers, self.num_heads, D, self.ff_size,
                self.dropout, tfm.gelu_exact, self.dtype, name="encoder",
            )
        # --- decoder family ---
        if self.dec_arch == "fc":
            # reference: architectures/fc.py:77-83
            self.dec_fc1 = nn.Dense(256, name="dec_fc1")
            self.dec_fc2 = nn.Dense(512, name="dec_fc2")
            self.dec_out = nn.Dense(
                self.input_feats * self.num_frames, name="dec_out"
            )
        elif self.dec_arch == "gru":
            # reference: architectures/gru.py:99-143
            self.dec_embed = nn.Dense(D, name="dec_embed")
            self.dec_grus = [
                nn.RNN(nn.GRUCell(features=D), name=f"dec_gru_{i}")
                for i in range(self.num_gru_layers)
            ]
            self.dec_out = nn.Dense(self.input_feats, name="dec_out")
        elif self.dec_arch == "autotrans":
            # reference: architectures/autotrans.py:59-190 — z and the
            # shifted target frames are each augmented with the class
            # one-hot + normalised-time channel, embedded, and run through
            # a causal joeynmt pre-norm transformer decoder (teacher-forced
            # in training; golden-tested vs the executing reference module,
            # released autotrans weights convert via convert_actor_cvae)
            self.at_src_embedding = nn.Dense(D, name="at_src_embedding")
            self.at_x_embedding = nn.Dense(D, name="at_x_embedding")
            self.at_layers = [
                JoeynmtDecoderLayer(
                    self.num_heads, D, self.ff_size, self.dropout,
                    self.dtype, name=f"at_layer_{i}",
                )
                for i in range(self.num_layers)
            ]
            self.at_emb_dropout = nn.Dropout(self.dropout)
            self.at_norm = nn.LayerNorm(epsilon=1e-6, name="at_norm")
            self.at_out = nn.Dense(self.input_feats, use_bias=False,
                                   name="at_out")
        else:
            self.action_biases = self.param(
                "action_biases", nn.initializers.normal(0.02),
                (self.num_actions, D),
            )
            self.decoder = tfm.Decoder(
                self.num_layers, self.num_heads, D, self.ff_size,
                self.dropout, tfm.gelu_exact, self.dtype, name="decoder",
            )
            self.final_layer = nn.Dense(self.input_feats, name="final_layer")

    def _onehot(self, action):
        return jax.nn.one_hot(action, self.num_actions, dtype=jnp.float32)

    def _time_channel(self, B, T):
        # reference gru.py:16-18 with full-length windows: arange(T)/(T-1)
        t = jnp.arange(T, dtype=jnp.float32) / jnp.maximum(T - 1, 1)
        return jnp.broadcast_to(t[None, :, None], (B, T, 1))

    def encode(self, x, action, train=False):
        """x [B, J, F, T], action [B] -> (mu, logvar) [B, D]."""
        B, J, F, T = x.shape
        seq = jnp.transpose(x, (0, 3, 1, 2)).reshape(B, T, J * F)
        if self.enc_arch == "fc":
            h = jnp.concatenate([x.reshape(B, -1), self._onehot(action)], 1)
            h = tfm.gelu_exact(self.enc_fc1(h))
            h = tfm.gelu_exact(self.enc_fc2(h))
            return self.enc_mu(h), self.enc_var(h)
        if self.enc_arch == "gru":
            h = jnp.concatenate(
                [seq, jnp.broadcast_to(self._onehot(action)[:, None],
                                       (B, T, self.num_actions)),
                 self._time_channel(B, T)], axis=2,
            )
            h = self.enc_embed(h)
            for gru in self.enc_grus:
                h = gru(h)
            h = h[:, -1]  # last valid frame (full-length windows)
            return self.enc_mu(h), self.enc_var(h)
        h = self.skel_embedding(seq)
        mu_tok = self.mu_query[action][:, None, :]
        sigma_tok = self.sigma_query[action][:, None, :]
        h = jnp.concatenate([mu_tok, sigma_tok, h], axis=1)
        pos = tfm.sinusoidal_table(5000, self.latent_dim)
        h = h + pos[None, : h.shape[1]]
        out = self.encoder(h, None, deterministic=not train)
        return out[:, 0], out[:, 1]

    def decode(self, z, action, num_frames, train=False, x_teacher=None):
        """z [B, D], action [B] -> x_hat [B, J, F, T].

        `x_teacher` [B, J, F, T] enables teacher forcing for the autotrans
        decoder (reference autotrans.py:128-156); other families ignore it.
        """
        B = z.shape[0]
        if self.dec_arch == "fc":
            h = jnp.concatenate([z, self._onehot(action)], 1)
            h = tfm.gelu_exact(self.dec_fc1(h))
            h = tfm.gelu_exact(self.dec_fc2(h))
            h = tfm.gelu_exact(self.dec_out(h))  # final GELU as in fc.py:78-83
            return h.reshape(B, self.njoints, self.nfeats, self.num_frames)
        if self.dec_arch == "gru":
            T = num_frames
            h = jnp.concatenate([z, self._onehot(action)], 1)
            h = jnp.broadcast_to(h[:, None], (B, T, h.shape[-1]))
            h = jnp.concatenate([h, self._time_channel(B, T)], axis=2)
            h = self.dec_embed(h)
            for gru in self.dec_grus:
                h = gru(h)
            h = self.dec_out(h)  # [B, T, J*F]
            return jnp.transpose(
                h.reshape(B, T, self.njoints, self.nfeats), (0, 2, 3, 1)
            )
        if self.dec_arch == "autotrans":
            return self._decode_autotrans(z, action, num_frames, train,
                                          x_teacher)
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

    def _decode_autotrans(self, z, action, num_frames, train, x_teacher):
        """Teacher-forced causal decode (reference autotrans.py:112-156).

        The memory sequence embeds z (+class one-hot, +time) per frame; the
        target sequence embeds the one-frame-shifted input (BOS = zeros).
        Autoregressive generation loops this with generate_autoregressive.
        """
        B, T = z.shape[0], num_frames
        onehot = jnp.broadcast_to(
            self._onehot(action)[:, None], (B, T, self.num_actions)
        )
        time_ch = self._time_channel(B, T)
        za = jnp.broadcast_to(z[:, None, :], (B, T, self.latent_dim))
        src = self.at_src_embedding(
            jnp.concatenate([za, onehot, time_ch], axis=2)
        )
        if x_teacher is None:
            shifted = jnp.zeros((B, T, self.input_feats), jnp.float32)
        else:
            seq = jnp.transpose(x_teacher, (0, 3, 1, 2)).reshape(
                B, T, self.input_feats
            )
            shifted = jnp.concatenate(
                [jnp.zeros((B, 1, self.input_feats), seq.dtype),
                 seq[:, :-1]], axis=1,
            )
        tgt = self.at_x_embedding(
            jnp.concatenate([shifted, onehot, time_ch], axis=2)
        )
        tgt = tgt + tfm.sinusoidal_table(5000, self.latent_dim)[None, :T]
        tgt = self.at_emb_dropout(tgt, deterministic=not train)
        out = tgt
        mask = tfm.causal_mask(T)
        for layer in self.at_layers:
            out = layer(out, src, mask, deterministic=not train)
        out = self.at_out(self.at_norm(out))  # [B, T, J*F]
        return jnp.transpose(
            out.reshape(B, T, self.njoints, self.nfeats), (0, 2, 3, 1)
        )

    def __call__(self, x, action, rng=None, train=False):
        mu, logvar = self.encode(x, action, train)
        if rng is None or not self.vae:
            z = mu
        else:
            std = jnp.exp(0.5 * logvar)
            z = mu + std * jax.random.normal(rng, mu.shape)
        x_hat = self.decode(z, action, x.shape[-1], train, x_teacher=x)
        return {"output": x_hat, "mu": mu, "logvar": logvar, "z": z}

    def generate(self, variables, action, num_frames, rng):
        z = jax.random.normal(
            rng, (action.shape[0], self.latent_dim), jnp.float32
        )
        if self.dec_arch == "autotrans":
            return self.generate_autoregressive(
                variables, z, action, num_frames
            )
        return self.apply(
            variables, z, action, num_frames, method=self.decode
        )

    def generate_autoregressive(self, variables, z, action, num_frames):
        """Frame-by-frame autotrans generation (reference
        autotrans.py:157-189): each step re-decodes the growing prefix
        (fixed-shape buffer, one compile) and appends its last frame."""
        B, T = z.shape[0], num_frames

        @jax.jit
        def step(x_buf, i):
            # x_buf [B, J, F, T] holds frames 0..i-1; causal masking makes
            # positions > i irrelevant to output frame i
            out = self.apply(
                variables, z, action, T, method=self.decode,
                x_teacher=x_buf,
            )
            frame = jax.lax.dynamic_slice_in_dim(out, i, 1, axis=3)
            return jax.lax.dynamic_update_slice_in_dim(x_buf, frame, i, 3)

        x_buf = jnp.zeros((B, self.njoints, self.nfeats, T), jnp.float32)
        for i in range(T):
            x_buf = step(x_buf, jnp.asarray(i, jnp.int32))  # one compile
        return x_buf


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

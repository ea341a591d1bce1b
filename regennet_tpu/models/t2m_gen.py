"""The comp_v6 text-to-motion generator (Guo et al.), in Flax.

Capability parity with the legacy T2M generative stack the reference
carries (reference: data_loaders/humanml/networks/modules.py:62-309 +
trainers.py CompTrainerV6:211-540 and
motion_loaders/comp_v6_model_dataset.py): a snippet-autoregressive
text-to-motion VAE — a BiGRU text encoder produces per-word hiddens, a
scalar-attention layer conditions each step, prior/posterior GRU cells emit
per-snippet latents with a time-to-arrival positional code, a GRU decoder
predicts the next movement snippet, and the (frozen-encoder) movement
decoder maps snippets back to pose features.

The per-snippet loop is unrolled at trace time (mov_len =
max_motion_length // unit_length is a static config constant): this is
offline baseline machinery, not the ReGenNet hot path, so trace size is
preferred over lifted-scan complexity.

Deviations (documented): the time-to-arrival index is clipped at 0 where
the torch code would wrap negative indices into the positional table.
(The attention softmax matches the reference exactly: it runs over
max(cap_lens) positions — the pad_packed_sequence trim — with zero word
hiddens between a row's own cap_len and the batch max participating at
logit 0, see AttLayer.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from regennet_tpu.models.transformer import sinusoidal_table

T2M_GEN_OPT = dict(
    dim_word=300, dim_pos_ohot=15, dim_text_hidden=512, dim_att_vec=512,
    dim_z=128, dim_pri_hidden=1024, dim_pos_hidden=1024, dim_dec_hidden=1024,
    n_layers_pri=1, n_layers_pos=1, n_layers_dec=1, dim_movement_latent=512,
    unit_length=4,
)


class TextEncoderBiGRU(nn.Module):
    """word+POS -> per-word BiGRU hiddens and the final state (reference:
    networks/modules.py:267-309)."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        B = word_embs.shape[0]
        pos_embs = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos_embs)
        h0 = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        lengths = jnp.asarray(cap_lens, jnp.int32)
        carry_f, out_f = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="fwd_cell"),
            name="gru_fwd",
        )(x, initial_carry=jnp.broadcast_to(h0[0], (B, self.hidden_size)),
          seq_lengths=lengths, return_carry=True)
        carry_b, out_b = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="bwd_cell"),
            name="gru_bwd", reverse=True, keep_order=True,
        )(x, initial_carry=jnp.broadcast_to(h0[1], (B, self.hidden_size)),
          seq_lengths=lengths, return_carry=True)
        # the reference FLIPS the backward stream within each valid length
        # (modules.py:303-306): output position i carries the backward
        # hidden of position length-1-i. keep_order=True gives the aligned
        # (pre-flip) stream, so apply the same per-row flip here.
        idx = jnp.arange(x.shape[1])[None, :]
        flip_idx = jnp.where(
            idx < lengths[:, None], lengths[:, None] - 1 - idx, idx
        )
        out_b = jnp.take_along_axis(out_b, flip_idx[..., None], axis=1)
        word_hids = jnp.concatenate([out_f, out_b], axis=-1)  # [B, L, 2H]
        # torch pad_packed_sequence zeroes positions >= length; the
        # attention softmaxes over the FULL padded caption (reference
        # quirk), so the zeros are semantically load-bearing (W_k has no
        # bias -> zero hiddens contribute logit 0)
        word_hids = word_hids * (idx < lengths[:, None])[..., None]
        hidden = jnp.concatenate([carry_f, carry_b], axis=-1)  # [B, 2H]
        return word_hids, hidden


class AttLayer(nn.Module):
    """Scalar dot attention of the decoder state over word hiddens
    (reference: networks/modules.py:232-259)."""

    value_dim: int = 512

    @nn.compact
    def __call__(self, query, key_mat, valid_len=None):
        """valid_len: scalar — positions >= valid_len are EXCLUDED from the
        softmax. The reference's word hiddens come from
        pad_packed_sequence, so its softmax runs over max(cap_lens)
        positions (zero hiddens between a row's cap_len and the batch max
        still participate with logit 0 and value W_v's bias — reference
        quirk, reproduced); positions beyond the batch max don't exist
        there at all (modules.py:246-261 + TextEncoderBiGRU:299)."""
        q = nn.Dense(self.value_dim, name="W_q")(query)  # [B, V]
        k = nn.Dense(self.value_dim, use_bias=False, name="W_k")(key_mat)
        v = nn.Dense(self.value_dim, name="W_v")(key_mat)  # [B, L, V]
        weights = jnp.einsum("blv,bv->bl", k, q) / jnp.sqrt(
            jnp.asarray(self.value_dim, q.dtype)
        )
        if valid_len is not None:
            idx = jnp.arange(weights.shape[1])[None, :]
            weights = jnp.where(idx < valid_len, weights, -jnp.inf)
        co = jax.nn.softmax(weights, axis=1)[..., None]  # [B, L, 1]
        return jnp.sum(v * co, axis=1), co


def _mlp_emb(x, hidden, name):
    h = nn.Dense(hidden, name=f"{name}_dense")(x)
    h = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")(h)
    return nn.leaky_relu(h, 0.2)


class TextDecoderCell(nn.Module):
    """Prior/posterior per-snippet cell: emb -> stacked GRUCells -> z, mu,
    logvar (reference: networks/modules.py:187-229 TextDecoder)."""

    text_size: int
    output_size: int = 128
    hidden_size: int = 1024
    n_layers: int = 1

    def setup(self):
        self.z2init = nn.Dense(self.hidden_size * self.n_layers,
                               name="z2init")
        self.cells = [
            nn.GRUCell(features=self.hidden_size, name=f"gru_{i}")
            for i in range(self.n_layers)
        ]
        self.emb_dense = nn.Dense(self.hidden_size, name="emb_dense")
        self.emb_ln = nn.LayerNorm(epsilon=1e-5, name="emb_ln")
        self.mu_net = nn.Dense(self.output_size, name="mu_net")
        self.logvar_net = nn.Dense(self.output_size, name="logvar_net")

    def get_init_hidden(self, latent):
        h = self.z2init(latent)
        return list(jnp.split(h, self.n_layers, axis=-1))

    def __call__(self, inputs, hidden, tta, rng: Optional[jax.Array]):
        x = nn.leaky_relu(self.emb_ln(self.emb_dense(inputs)), 0.2)
        pe = sinusoidal_table(5000, self.hidden_size)[
            jnp.clip(jnp.asarray(tta, jnp.int32), 0)
        ]
        x = x + jax.lax.stop_gradient(pe)
        new_hidden = list(hidden)
        # reference quirk (networks/modules.py:223-226): every layer of the
        # prior/posterior cell receives the SAME embedded input (the loop
        # never rebinds x_in); mu/logvar read the last layer's hidden.
        # Reproduced verbatim (differs from TextVAEDecoderCell, which
        # chains properly, matching modules.py:175-178).
        last = None
        for i, cell in enumerate(self.cells):
            new_hidden[i], last = cell(new_hidden[i], x)
        mu = self.mu_net(last)
        logvar = self.logvar_net(last)
        if rng is None:
            z = mu
        else:
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return z, mu, logvar, new_hidden


class TextVAEDecoderCell(nn.Module):
    """Snippet decoder cell: emb -> stacked GRUCells -> output MLP
    (reference: networks/modules.py:123-184 TextVAEDecoder)."""

    text_size: int
    output_size: int = 512
    hidden_size: int = 1024
    n_layers: int = 1

    def setup(self):
        self.z2init = nn.Dense(self.hidden_size * self.n_layers,
                               name="z2init")
        self.cells = [
            nn.GRUCell(features=self.hidden_size, name=f"gru_{i}")
            for i in range(self.n_layers)
        ]
        self.emb_dense = nn.Dense(self.hidden_size, name="emb_dense")
        self.emb_ln = nn.LayerNorm(epsilon=1e-5, name="emb_ln")
        self.out1 = nn.Dense(self.hidden_size, name="out1")
        self.out_ln = nn.LayerNorm(epsilon=1e-5, name="out_ln")
        self.out2 = nn.Dense(self.output_size, name="out2")

    def get_init_hidden(self, latent):
        h = self.z2init(latent)
        return list(jnp.split(h, self.n_layers, axis=-1))

    def __call__(self, inputs, hidden, tta):
        x = nn.leaky_relu(self.emb_ln(self.emb_dense(inputs)), 0.2)
        pe = sinusoidal_table(5000, self.hidden_size)[
            jnp.clip(jnp.asarray(tta, jnp.int32), 0)
        ]
        x = x + jax.lax.stop_gradient(pe)
        new_hidden = list(hidden)
        for i, cell in enumerate(self.cells):
            new_hidden[i], x = cell(new_hidden[i], x)
        out = self.out2(nn.leaky_relu(self.out_ln(self.out1(x)), 0.2))
        return out, new_hidden


class CompV6Generator(nn.Module):
    """Snippet-autoregressive text2motion VAE (CompTrainerV6's network set,
    minus the frozen movement encoder, which stays outside like the
    reference's detached mov_enc).

    `__call__` is the training forward (posterior latents, optional teacher
    forcing); `generate` samples from the prior. Both consume precomputed
    movement-space tensors: `movements` [B, M, D_mov] (targets; training
    only) and `mov_in0` [B, D_mov] (the encoded zero-snippet start token,
    reference trainers.py:292-296).
    """

    dim_pose: int = 263
    dim_word: int = 300
    dim_pos_ohot: int = 15
    text_hidden: int = 512
    att_vec: int = 512
    dim_z: int = 128
    pri_hidden: int = 1024
    dec_hidden: int = 1024
    n_layers: int = 1
    mov_latent: int = 512

    def setup(self):
        th2 = self.text_hidden * 2
        self.text_enc = TextEncoderBiGRU(
            self.dim_word, self.dim_pos_ohot, self.text_hidden,
            name="text_enc",
        )
        self.att_layer = AttLayer(self.att_vec, name="att_layer")
        self.seq_pri = TextDecoderCell(
            th2, self.dim_z, self.pri_hidden, self.n_layers, name="seq_pri"
        )
        self.seq_post = TextDecoderCell(
            th2, self.dim_z, self.pri_hidden, self.n_layers, name="seq_post"
        )
        self.seq_dec = TextVAEDecoderCell(
            th2, self.mov_latent, self.dec_hidden, self.n_layers,
            name="seq_dec",
        )
        from regennet_tpu.models.t2m_eval import MovementConvDecoder

        self.mov_dec = MovementConvDecoder(
            self.mov_latent, self.dim_pose, name="mov_dec"
        )

    def _loop(self, word_embs, pos_ohot, cap_lens, m_lens, mov_in0, rng,
              mov_len: int, unit_length: int, movements=None,
              teacher_force=None, use_posterior=True):
        word_hids, hidden = self.text_enc(word_embs, pos_ohot, cap_lens)
        h_pri = self.seq_pri.get_init_hidden(hidden)
        h_dec = self.seq_dec.get_init_hidden(hidden)
        h_post = (
            self.seq_post.get_init_hidden(hidden) if use_posterior else None
        )
        mov_in = mov_in0
        mus_pri, logvars_pri, mus_post, logvars_post, fakes = (
            [], [], [], [], []
        )
        m_lens = jnp.asarray(m_lens, jnp.int32)
        cap_max = jnp.max(jnp.asarray(cap_lens, jnp.int32))
        for i in range(mov_len):
            att_vec, _ = self.att_layer(h_dec[-1], word_hids, cap_max)
            tta = m_lens // unit_length - i
            rng, r_pos, r_pri = (
                jax.random.split(rng, 3) if rng is not None
                else (None, None, None)
            )
            pri_in = jnp.concatenate([mov_in, att_vec], axis=-1)
            z_pri, mu_pri, lv_pri, h_pri = self.seq_pri(
                pri_in, h_pri, tta, r_pri
            )
            z = z_pri
            if use_posterior:
                pos_in = jnp.concatenate(
                    [mov_in, movements[:, i], att_vec], axis=-1
                )
                z_pos, mu_pos, lv_pos, h_post = self.seq_post(
                    pos_in, h_post, tta, r_pos
                )
                mus_post.append(mu_pos)
                logvars_post.append(lv_pos)
                z = z_pos
            dec_in = jnp.concatenate([mov_in, att_vec, z], axis=-1)
            fake_mov, h_dec = self.seq_dec(dec_in, h_dec, tta)
            mus_pri.append(mu_pri)
            logvars_pri.append(lv_pri)
            fakes.append(fake_mov)
            if movements is not None and teacher_force is not None:
                tf = teacher_force.astype(fake_mov.dtype)
                mov_in = jax.lax.stop_gradient(
                    tf * movements[:, i] + (1 - tf) * fake_mov
                )
            else:
                mov_in = jax.lax.stop_gradient(fake_mov)
        fake_movements = jnp.stack(fakes, axis=1)  # [B, M, D_mov]
        fake_motions = self.mov_dec(fake_movements)
        out = {
            "fake_motions": fake_motions,
            "fake_movements": fake_movements,
            "mus_pri": jnp.concatenate(mus_pri, axis=0),
            "logvars_pri": jnp.concatenate(logvars_pri, axis=0),
        }
        if use_posterior:
            out["mus_post"] = jnp.concatenate(mus_post, axis=0)
            out["logvars_post"] = jnp.concatenate(logvars_post, axis=0)
        return out

    def __call__(self, word_embs, pos_ohot, cap_lens, movements, m_lens,
                 mov_in0, rng, teacher_force, unit_length: int = 4):
        """Training forward (reference trainers.py:278-381): posterior
        latents drive the decoder; `teacher_force` [B or scalar] selects GT
        vs predicted snippets as the next input."""
        mov_len = movements.shape[1]
        return self._loop(
            word_embs, pos_ohot, cap_lens, m_lens, mov_in0, rng, mov_len,
            unit_length, movements=movements,
            teacher_force=jnp.asarray(teacher_force), use_posterior=True,
        )

    def generate(self, word_embs, pos_ohot, cap_lens, m_lens, mov_in0,
                 rng, mov_len: int, unit_length: int = 4):
        """Prior sampling (reference trainers.py:383-450)."""
        return self._loop(
            word_embs, pos_ohot, cap_lens, m_lens, mov_in0, rng, mov_len,
            unit_length, movements=None, use_posterior=False,
        )


def smooth_l1(pred, target):
    """torch SmoothL1Loss (beta=1) mean."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def kl_criterion(mu1, logvar1, mu2, logvar2):
    """KL(N(mu1, var1) || N(mu2, var2)), summed then / batch (reference:
    trainers.py:260-268)."""
    kld = (
        0.5 * (logvar2 - logvar1)
        + (jnp.exp(logvar1) + (mu1 - mu2) ** 2) / (2 * jnp.exp(logvar2))
        - 0.5
    )
    return jnp.sum(kld) / mu1.shape[0]


def comp_v6_losses(out: Dict, motions, movements, lambda_rec_mov=1.0,
                   lambda_rec_mot=1.0, lambda_kld=0.005):
    """reference: trainers.py backward_G (:452-467). Note the reference
    swaps the two lambda names when weighting (mot_rec * lambda_rec_mov +
    mov_rec * lambda_rec_mot) — reproduced verbatim."""
    loss_mot_rec = smooth_l1(out["fake_motions"], motions)
    loss_mov_rec = smooth_l1(out["fake_movements"], movements)
    loss_kld = kl_criterion(
        out["mus_post"], out["logvars_post"],
        out["mus_pri"], out["logvars_pri"],
    )
    loss = (loss_mot_rec * lambda_rec_mov + loss_mov_rec * lambda_rec_mot
            + loss_kld * lambda_kld)
    return {
        "loss_gen": loss, "loss_mot_rec": loss_mot_rec,
        "loss_mov_rec": loss_mov_rec, "loss_kld": loss_kld,
    }

"""Text-to-motion matching evaluators (Guo et al. "t2m"), in Flax.

Parity with the reference evaluator networks (reference:
data_loaders/humanml/networks/modules.py:79-100, TextEncoderBiGRUCo /
MotionEncoderBiGRUCo, and evaluator_wrapper.py:121-199): a strided conv
movement encoder, a BiGRU text tower over GloVe+POS embeddings, and a BiGRU
motion tower over movement latents, projecting both into a shared embedding
space for R-precision / matching-score / FID evaluation.

Length handling: the torch version packs sequences (and therefore permutes
the batch by length); here the BiGRU reads masked sequences directly via
flax.nn.RNN(seq_lengths=...), so batch order is preserved — a pure
permutation, metrics identical.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

T2M_OPT = dict(
    dim_word=300, dim_pos_ohot=15, dim_text_hidden=512, dim_coemb_hidden=512,
    dim_motion_hidden=1024, dim_movement_enc_hidden=512,
    dim_movement_latent=512, unit_length=4, max_text_len=20,
)


class MovementConvEncoder(nn.Module):
    """Two stride-2 convs over time (unit_length 4 compression) + linear."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, x):  # [B, T, F]
        h = nn.Conv(self.hidden_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.output_size, kernel_size=(4,), strides=(2,),
                    padding=[(1, 1)], name="conv2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_net")(h)


class MovementConvDecoder(nn.Module):
    """Two stride-2 transposed convs + linear, inverting MovementConvEncoder
    (reference: data_loaders/humanml/networks/modules.py:101-120)."""

    hidden_size: int = 512
    output_size: int = 263

    @nn.compact
    def __call__(self, x):  # [B, T/4, latent] -> [B, T, output]
        # SAME padding gives the exact 2x upsample per layer (torch's
        # ConvTranspose1d(k=4, s=2, p=1) arithmetic); only the movement
        # ENCODER participates in evaluator checkpoints, so decoder padding
        # needs shape-equivalence, not weight-layout parity
        h = nn.ConvTranspose(self.hidden_size, kernel_size=(4,), strides=(2,),
                             padding="SAME", name="deconv1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.ConvTranspose(self.output_size, kernel_size=(4,), strides=(2,),
                             padding="SAME", name="deconv2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_net")(h)


def contrastive_loss(x, y, label, margin: float = 10.0):
    """Hadsell-Chopra-LeCun contrastive loss (reference:
    networks/modules.py:11-24): label 0 pulls pairs together (d^2), label 1
    pushes them past the margin (max(0, margin - d)^2)."""
    d = jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1) + 1e-12)
    label = jnp.asarray(label, d.dtype)
    return jnp.mean(
        (1 - label) * d ** 2
        + label * jnp.maximum(margin - d, 0.0) ** 2
    )


class _BiGRUCo(nn.Module):
    """Shared BiGRU trunk: learned initial hidden, masked final states,
    2H -> H LN LeakyReLU -> out projection."""

    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x, lengths):  # x [B, T, H_in] already embedded
        B, T, _ = x.shape
        h0 = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        fwd = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="fwd_cell"),
            name="gru_fwd",
        )
        bwd = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="bwd_cell"),
            name="gru_bwd", reverse=True, keep_order=True,
        )
        lengths = jnp.asarray(lengths, jnp.int32)
        carry_f, out_f = fwd(
            x, initial_carry=jnp.broadcast_to(h0[0], (B, self.hidden_size)),
            seq_lengths=lengths, return_carry=True,
        )
        carry_b, out_b = bwd(
            x, initial_carry=jnp.broadcast_to(h0[1], (B, self.hidden_size)),
            seq_lengths=lengths, return_carry=True,
        )
        gru_last = jnp.concatenate([carry_f, carry_b], axis=-1)
        h = nn.Dense(self.hidden_size, name="out1")(gru_last)
        h = nn.LayerNorm(epsilon=1e-5, name="out_ln")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out2")(h)


class TextEncoderBiGRUCo(nn.Module):
    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos_embs = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = word_embs + pos_embs
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        return _BiGRUCo(self.hidden_size, self.output_size, name="bigru")(
            input_embs, cap_lens
        )


class MotionEncoderBiGRUCo(nn.Module):
    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, movements, m_lens):
        input_embs = nn.Dense(self.hidden_size, name="input_emb")(movements)
        return _BiGRUCo(self.hidden_size, self.output_size, name="bigru")(
            input_embs, m_lens
        )


class MotionLenEstimatorBiGRU(nn.Module):
    """Text -> motion-length-bin logits (reference:
    networks/modules.py:389-437 + LengthEstTrainer:748-877): POS embedding
    added to word embeddings, BiGRU with learned initial hidden, and a
    512->256->128 LayerNorm/LeakyReLU MLP head over the concatenated final
    states."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 50  # 200 frames // unit_length 4

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        B, T, _ = word_embs.shape
        pos_embs = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos_embs)
        h0 = self.param(
            "hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size)
        )
        lengths = jnp.asarray(cap_lens, jnp.int32)
        carry_f, _ = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="fwd_cell"),
            name="gru_fwd",
        )(x, initial_carry=jnp.broadcast_to(h0[0], (B, self.hidden_size)),
          seq_lengths=lengths, return_carry=True)
        carry_b, _ = nn.RNN(
            nn.GRUCell(features=self.hidden_size, name="bwd_cell"),
            name="gru_bwd", reverse=True, keep_order=True,
        )(x, initial_carry=jnp.broadcast_to(h0[1], (B, self.hidden_size)),
          seq_lengths=lengths, return_carry=True)
        h = jnp.concatenate([carry_f, carry_b], axis=-1)
        nd = 512
        for i, width in enumerate([nd, nd // 2, nd // 4]):
            h = nn.Dense(width, name=f"head_{i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, name=f"head_ln_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="head_out")(h)


class T2MEvaluatorWrapper:
    """Co-embedding interface (reference: EvaluatorMDMWrapper.get_co_embeddings
    / get_motion_embeddings). `variables` holds the three networks' params as
    {'movement': ..., 'text': ..., 'motion': ...}."""

    def __init__(self, dataset_name: str = "humanml", variables=None,
                 rng_seed: int = 0):
        opt = dict(T2M_OPT)
        opt["dim_pose"] = 263 if dataset_name == "humanml" else 251
        self.opt = opt
        self.movement_enc = MovementConvEncoder(
            opt["dim_movement_enc_hidden"], opt["dim_movement_latent"]
        )
        self.text_enc = TextEncoderBiGRUCo(
            opt["dim_word"], opt["dim_pos_ohot"], opt["dim_text_hidden"],
            opt["dim_coemb_hidden"],
        )
        self.motion_enc = MotionEncoderBiGRUCo(
            opt["dim_movement_latent"], opt["dim_motion_hidden"],
            opt["dim_coemb_hidden"],
        )
        if variables is None:
            variables = self.init_random(rng_seed)
        self.variables = variables
        self._motion_embed = jax.jit(self._motion_embed_impl)
        self._text_embed = jax.jit(self._text_embed_impl)

    def init_random(self, seed: int = 0) -> Dict:
        rng = jax.random.PRNGKey(seed)
        mov = self.movement_enc.init(
            rng, jnp.zeros((1, 8, self.opt["dim_pose"] - 4))
        )["params"]
        text = self.text_enc.init(
            rng, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)),
            jnp.asarray([4]),
        )["params"]
        mot = self.motion_enc.init(
            rng, jnp.zeros((1, 2, self.opt["dim_movement_latent"])),
            jnp.asarray([2]),
        )["params"]
        return {"movement": mov, "text": text, "motion": mot}

    def _motion_embed_impl(self, variables, motions, m_lens):
        movements = self.movement_enc.apply(
            {"params": variables["movement"]}, motions[..., :-4]
        )
        return self.motion_enc.apply(
            {"params": variables["motion"]}, movements,
            m_lens // self.opt["unit_length"],
        )

    def _text_embed_impl(self, variables, word_embs, pos_ohot, cap_lens):
        return self.text_enc.apply(
            {"params": variables["text"]}, word_embs, pos_ohot, cap_lens
        )

    def get_motion_embeddings(self, motions, m_lens) -> np.ndarray:
        return np.asarray(
            self._motion_embed(
                self.variables, jnp.asarray(motions, jnp.float32),
                jnp.asarray(m_lens, jnp.int32),
            )
        )

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions,
                          m_lens):
        text = np.asarray(
            self._text_embed(
                self.variables, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(cap_lens, jnp.int32),
            )
        )
        motion = self.get_motion_embeddings(motions, m_lens)
        return text, motion

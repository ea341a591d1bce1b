"""GRU motion classifier for the action2motion evaluation protocol.

Flax port of the MotionDiscriminator family (reference:
eval/a2m/action2motion/models.py): stacked GRU over per-frame joint
coordinates; `features` = tanh(linear1(·)) of the last valid hidden state
— the 30-dim vector MotionDiscriminatorForFID returns and the a2m
FID/diversity protocol consumes (reference: models.py:44-62) — and
`yhat` = linear2 logits. The raw last-valid hidden state is exposed as
`hidden`. Deterministic zero hidden init (the reference seeds a randn
hidden state per forward — a reproducibility wart we drop).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MotionDiscriminator(nn.Module):
    input_size: int = 72      # 24 joints x 3
    hidden_size: int = 128
    hidden_layers: int = 2
    output_size: int = 12

    @nn.compact
    def __call__(self, motion, lengths=None):
        """motion [B, J, F, T] -> {'features' [B, H], 'yhat' [B, C]}."""
        B, J, F, T = motion.shape
        x = jnp.transpose(motion.reshape(B, J * F, T), (0, 2, 1))  # [B, T, JF]
        h = x.astype(jnp.float32)
        for i in range(self.hidden_layers):
            h = nn.RNN(nn.GRUCell(features=self.hidden_size), name=f"gru_{i}")(h)
        if lengths is None:
            feat = h[:, -1]
        else:
            idx = jnp.clip(lengths - 1, 0, T - 1)
            feat = jnp.take_along_axis(h, idx[:, None, None], axis=1)[:, 0]
        lin1 = jnp.tanh(nn.Dense(30, name="linear1")(feat))
        logits = nn.Dense(self.output_size, name="linear2")(lin1)
        return {"features": lin1, "hidden": feat, "yhat": logits}

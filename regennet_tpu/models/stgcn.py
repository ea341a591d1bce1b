"""Spatial-temporal GCN action classifier (evaluator), as a Flax module.

Port of the frozen evaluation classifier (reference:
eval/a2m/recognition/models/stgcn.py + stgcnutils/tgcn.py) — 10 st-gcn
blocks 64->128->256, learnable per-block edge importance, spatial-partition
graph over the SMPL/SMPL-X kintree with a root-translation node, and a
2-person input reshape. Produces pooled `features` (for FID/diversity) and
`yhat` logits (for accuracy), same as the reference.

Layout: convolutions run NHWC ([N*M, T, V, C]); the parameter structure maps
1:1 onto the torch checkpoint for conversion (see eval/convert_stgcn.py).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from regennet_tpu.models.stgcn_graph import Graph

# torch BatchNorm2d default momentum is 0.1, i.e. running = 0.9*running +
# 0.1*batch (reference: eval/a2m/recognition/models/stgcn.py uses the
# default). Flax's default momentum=0.99 converges running stats 10x
# slower — measured on the learnable synthetic task: after a short
# training run the eval-mode (running-stats) classifier collapsed to one
# class (exact-chance accuracy) while the SAME params scored 1.0 with
# batch stats. Converted reference checkpoints were unaffected (they ship
# torch's converged stats); only self-trained evaluators hit this.
_BN_MOMENTUM = 0.9


class ConvTemporalGraphical(nn.Module):
    """1x1 conv to K*C_out channels + einsum contraction with A [K, V, W]."""

    out_channels: int
    kernel_size: int  # spatial kernel size K

    @nn.compact
    def __call__(self, x, A):
        # x: [N, T, V, C]
        x = nn.Conv(
            self.out_channels * self.kernel_size, kernel_size=(1, 1),
            name="conv",
        )(x)
        N, T, V, _ = x.shape
        x = x.reshape(N, T, V, self.kernel_size, self.out_channels)
        return jnp.einsum("ntvkc,kvw->ntwc", x, A)


class STGCNBlock(nn.Module):
    out_channels: int
    temporal_kernel: int = 9
    spatial_kernel: int = 3
    stride: int = 1
    residual: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, A, train: bool = False):
        in_channels = x.shape[-1]
        if not self.residual:
            res = 0.0
        elif in_channels == self.out_channels and self.stride == 1:
            res = x
        else:
            res = nn.Conv(
                self.out_channels, kernel_size=(1, 1),
                strides=(self.stride, 1), name="res_conv",
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=_BN_MOMENTUM,
                name="res_bn",
            )(res)

        h = ConvTemporalGraphical(
            self.out_channels, self.spatial_kernel, name="gcn"
        )(x, A)
        h = nn.BatchNorm(use_running_average=not train,
                         momentum=_BN_MOMENTUM, name="tcn_bn0")(h)
        h = nn.relu(h)
        pad = (self.temporal_kernel - 1) // 2
        h = nn.Conv(
            self.out_channels, kernel_size=(self.temporal_kernel, 1),
            strides=(self.stride, 1), padding=((pad, pad), (0, 0)),
            name="tcn_conv",
        )(h)
        h = nn.BatchNorm(use_running_average=not train,
                         momentum=_BN_MOMENTUM, name="tcn_bn1")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.relu(h + res)


class STGCN(nn.Module):
    """in_channels counts BOTH persons (e.g. 12 for 2-person rot6d).

    `channels`/`strides` default to the 10-block recognition classifier
    (reference: eval/a2m/recognition/models/stgcn.py:52-62); the shallower
    unconstrained-eval variant (reference:
    eval/unconstrained/models/stgcn.py:52-63 — three of the ten blocks are
    commented out upstream) is built by `make_unconstrained_stgcn`.
    """

    in_channels: int
    num_class: int
    num_person: int = 2
    layout: str = "smplx"
    strategy: str = "spatial"
    edge_importance_weighting: bool = True
    dropout: float = 0.0
    channels: tuple = (64, 64, 64, 64, 128, 128, 128, 256, 256, 256)
    strides: tuple = (1, 1, 1, 1, 2, 1, 1, 2, 1, 1)

    def setup(self):
        graph = Graph(layout=self.layout, strategy=self.strategy)
        self.A = jnp.asarray(graph.A, dtype=jnp.float32)  # [K, V, V]
        self.num_node = graph.num_node
        channels = list(self.channels)
        strides = list(self.strides)
        self.blocks = [
            STGCNBlock(
                out_channels=c, stride=s, residual=(i != 0),
                dropout=self.dropout, name=f"st_gcn_{i}",
            )
            for i, (c, s) in enumerate(zip(channels, strides))
        ]
        if self.edge_importance_weighting:
            self.edge_importance = [
                self.param(f"edge_importance_{i}", nn.initializers.ones,
                           self.A.shape)
                for i in range(len(self.blocks))
            ]
        else:
            self.edge_importance = [1.0] * len(self.blocks)
        self.data_bn = nn.BatchNorm(momentum=_BN_MOMENTUM,
                                    name="data_bn")
        self.fcn = nn.Conv(self.num_class, kernel_size=(1, 1), name="fcn")

    def __call__(self, batch: Dict[str, Any], train: bool = False):
        x = jnp.asarray(batch["output"], jnp.float32)
        if self.num_person == 2:
            N, V, C2, T = x.shape
            M, C = 2, C2 // 2
            x = x.reshape(N, V, M, C, T)
            x = jnp.transpose(x, (0, 2, 1, 3, 4))  # [N, M, V, C, T]
        else:
            N, V, C, T = x.shape
            M = 1
            x = x[:, None]  # [N, 1, V, C, T]

        # data batch-norm over the (m, v, c) channel axis, stats over (N, T)
        h = x.reshape(N, M * V * C, T)
        h = jnp.transpose(h, (0, 2, 1))  # [N, T, MVC]
        h = self.data_bn(h, use_running_average=not train)
        h = jnp.transpose(h, (0, 2, 1)).reshape(N, M, V, C, T)

        # [N*M, T, V, C] for NHWC convs
        h = jnp.transpose(h, (0, 1, 4, 2, 3)).reshape(N * M, T, V, C)

        for block, importance in zip(self.blocks, self.edge_importance):
            h = block(h, self.A * importance, train=train)

        # global pool over (T, V), mean over persons
        h = jnp.mean(h, axis=(1, 2))  # [N*M, 256]
        feat = h.reshape(N, M, -1).mean(axis=1)  # [N, 256]

        logits = self.fcn(feat[:, None, None, :])[:, 0, 0, :]
        out = dict(batch)
        out["features"] = feat
        out["yhat"] = logits
        return out


def make_unconstrained_stgcn(num_class: int = 12) -> "STGCN":
    """The unconstrained-HumanAct12 evaluator: a 6-block single-person
    ST-GCN over 15 openpose-layout xyz joints (reference:
    eval/unconstrained/evaluate.py:21-32 instantiates it with in_channels=3,
    num_classes=12, layout='openpose', strategy='spatial')."""
    return STGCN(
        in_channels=3, num_class=num_class, num_person=1,
        layout="openpose", strategy="spatial",
        channels=(64, 64, 64, 128, 128, 256),
        strides=(1, 1, 1, 2, 1, 2),
    )


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def accuracy_from_logits(logits: np.ndarray, labels: np.ndarray) -> float:
    return float((np.argmax(logits, axis=1) == labels).mean())

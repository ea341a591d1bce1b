"""Sublane-tile sequence padding (REGENNET_PAD_T) equivalence tests.

models/cmdm pads the trunk sequence to the TPU sublane tile (16 rows bf16 /
8 rows f32) and slices the real frames back out — recovering the measured
~7-point config-2 MFU padding tax (docs/cfg60_profile_r4.json) at NTU's
T=60. These tests pin that the padded path is numerically EXACT vs the
unpadded path for every transformer trunk (the only cross-position op is
self-attention: causal masking hides the tail keys; the non-causal encoder
uses the kv_valid in-kernel key mask), forward and backward, including the
fused Pallas kernels in interpret mode.

reference: model/cmdm.py:168-227 — the protocol fixes T=60 but nothing
fixes the compute shape.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.models.cmdm import CMDM, make_cfg_model_fn, make_model_fn
from regennet_tpu.ops.pallas_attention import (
    attention_reference,
    fused_attention_btd,
)

pytestmark = pytest.mark.fast


def _make(arch, cm_mode, emb_trans_dec=False, dropout=0.0, T=13):
    B, J, F = 4, 5, 6
    model = CMDM(
        njoints=J, nfeats=F, num_actions=3, num_frames=T, latent_dim=16,
        ff_size=32, num_layers=2, num_heads=2, dropout=dropout, arch=arch,
        cm_mode=cm_mode, emb_trans_dec=emb_trans_dec, cond_mask_prob=0.1,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, J, F, T))
    cond = {
        "cmotion": jax.random.normal(jax.random.PRNGKey(1), (B, J, F, T)),
        "action": jnp.zeros((B, 1), jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(2), x, jnp.zeros((B,), jnp.int32), cond
    )["params"]
    t = jnp.array([3, 7, 1, 9])
    return model, params, x, t, cond


def _with_pad(flag, fn):
    old = os.environ.get("REGENNET_PAD_T")
    os.environ["REGENNET_PAD_T"] = flag
    try:
        return fn()
    finally:
        if old is None:
            os.environ.pop("REGENNET_PAD_T", None)
        else:
            os.environ["REGENNET_PAD_T"] = old


@pytest.mark.parametrize(
    "arch,cm_mode,emb_trans_dec",
    [
        ("online", "concat", False),
        ("online", "add", False),
        ("trans_dec", "concat", True),
        ("offline", "concat", False),
        ("trans_enc", "add", False),
    ],
)
def test_padded_forward_matches_unpadded(arch, cm_mode, emb_trans_dec):
    model, params, x, t, cond = _make(arch, cm_mode, emb_trans_dec)

    def run():
        return np.asarray(
            model.apply({"params": params}, x, t, cond, train=False)
        )

    ref = _with_pad("0", run)
    pad = _with_pad("1", run)
    assert pad.shape == ref.shape
    np.testing.assert_allclose(pad, ref, atol=2e-5, rtol=1e-5)


def test_padded_prepare_cond_path_matches():
    """The sampler route: prepare_cond + folded concat fuse, padded."""
    model, params, x, t, cond = _make("online", "concat")
    fn = make_model_fn(model, params)

    def run():
        return np.asarray(fn(x, t, fn.prepare(dict(cond))))

    ref = _with_pad("0", run)
    pad = _with_pad("1", run)
    np.testing.assert_allclose(pad, ref, atol=2e-5, rtol=1e-5)


def test_padded_cfg_fold_matches():
    model, params, x, t, cond = _make("online", "concat")
    fn = make_cfg_model_fn(model, params, guidance_scale=2.5)

    def run():
        return np.asarray(fn(x, t, fn.prepare(dict(cond))))

    ref = _with_pad("0", run)
    pad = _with_pad("1", run)
    np.testing.assert_allclose(pad, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("arch", ["online", "offline"])
def test_padded_gradients_match_unpadded(arch):
    """Training route (deterministic): the pad rows carry zero cotangent
    through the output slice, so parameter gradients are unchanged."""
    model, params, x, t, cond = _make(arch, "add")
    target = jax.random.normal(jax.random.PRNGKey(9), x.shape)

    def loss(p):
        out = model.apply(
            {"params": p}, x, t, cond, train=True,
            rngs={"dropout": jax.random.PRNGKey(5),
                  "cond_mask": jax.random.PRNGKey(6)},
        )
        return jnp.mean((out - target) ** 2)

    def run():
        return jax.tree_util.tree_map(np.asarray, jax.grad(loss)(params))

    ref = _with_pad("0", run)
    pad = _with_pad("1", run)
    flat_r = jax.tree_util.tree_leaves(ref)
    flat_p = jax.tree_util.tree_leaves(pad)
    for r, p in zip(flat_r, flat_p):
        np.testing.assert_allclose(p, r, atol=3e-5, rtol=2e-4)


def test_kernel_kv_len_masks_padded_keys():
    """fused_attention_btd on a tail-padded sequence with kv_len equals the
    reference attention on the unpadded sequence (non-causal — the case
    that actually needs the in-kernel key mask)."""
    B, T, H, hd = 2, 11, 2, 8
    Tp = 16
    D = H * hd
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, T, D))
    k = jax.random.normal(ks[1], (B, T, D))
    v = jax.random.normal(ks[2], (B, T, D))

    def pad(a):
        return jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0)))

    out_p = fused_attention_btd(
        pad(q), pad(k), pad(v), num_heads=H, causal=False, interpret=True,
        softmax_f32=True, kv_len=T,
    )[:, :T]

    def split(a):
        return a.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), causal=False)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


def test_kernel_causal_padding_needs_no_mask():
    """Causal attention: tail-padded keys are invisible to real query rows
    even WITHOUT kv_len — the property the decoder trunks rely on."""
    B, T, H, hd = 2, 11, 2, 8
    Tp = 16
    D = H * hd
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (B, T, D))
    k = jax.random.normal(ks[1], (B, T, D))
    v = jax.random.normal(ks[2], (B, T, D))

    def pad(a):
        return jnp.pad(a, ((0, 0), (0, Tp - T), (0, 0)))

    out_p = fused_attention_btd(
        pad(q), pad(k), pad(v), num_heads=H, causal=True, interpret=True,
        softmax_f32=True,
    )[:, :T]

    def split(a):
        return a.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

    ref = attention_reference(split(q), split(k), split(v), causal=True)
    ref = ref.transpose(0, 2, 1, 3).reshape(B, T, D)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

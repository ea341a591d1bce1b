"""Converter hardening tests: key-coverage enforcement + the --check CLI."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from regennet_tpu.convert import torch_ckpt as C


def _tiny_cmdm_sd(D=8, layers=1, njoints=4, nfeats=6):
    rng = np.random.default_rng(0)
    r = lambda *s: rng.normal(size=s).astype(np.float32)
    sd = {
        "input_process.poseEmbedding.weight": r(D, njoints * nfeats),
        "input_process.poseEmbedding.bias": r(D),
        "cmo_process.poseEmbedding.weight": r(D, njoints * nfeats),
        "cmo_process.poseEmbedding.bias": r(D),
        "embed_timestep.time_embed.0.weight": r(D, D),
        "embed_timestep.time_embed.0.bias": r(D),
        "embed_timestep.time_embed.2.weight": r(D, D),
        "embed_timestep.time_embed.2.bias": r(D),
        "embed_action.action_embedding": r(5, D),
        "output_process.poseFinal.weight": r(njoints * nfeats, D),
        "output_process.poseFinal.bias": r(njoints * nfeats),
    }
    for i in range(layers):
        p = f"seqTransDecoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = r(3 * D, D)
        sd[f"{p}.self_attn.in_proj_bias"] = r(3 * D)
        sd[f"{p}.self_attn.out_proj.weight"] = r(D, D)
        sd[f"{p}.self_attn.out_proj.bias"] = r(D)
        sd[f"{p}.multihead_attn.in_proj_weight"] = r(3 * D, D)
        sd[f"{p}.multihead_attn.in_proj_bias"] = r(3 * D)
        sd[f"{p}.multihead_attn.out_proj.weight"] = r(D, D)
        sd[f"{p}.multihead_attn.out_proj.bias"] = r(D)
        sd[f"{p}.linear1.weight"] = r(2 * D, D)
        sd[f"{p}.linear1.bias"] = r(2 * D)
        sd[f"{p}.linear2.weight"] = r(D, 2 * D)
        sd[f"{p}.linear2.bias"] = r(D)
        for n in ("norm1", "norm2", "norm3"):
            sd[f"{p}.{n}.weight"] = r(D)
            sd[f"{p}.{n}.bias"] = r(D)
    return sd


@pytest.mark.fast
def test_cmdm_converter_consumes_all_keys():
    C.convert_cmdm(_tiny_cmdm_sd(), "online")  # complete dict: no raise


@pytest.mark.fast
def test_cmdm_converter_rejects_unconsumed_keys():
    sd = _tiny_cmdm_sd()
    sd["mystery.extra.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        C.convert_cmdm(sd, "online")


@pytest.mark.fast
def test_cmdm_converter_ignores_stripped_tower_keys():
    """CLIP tower / body-model buffers / PE buffers may remain in ad-hoc
    dumps; they are expected leftovers, not layout drift."""
    sd = _tiny_cmdm_sd()
    sd["clip_model.text_projection"] = np.zeros((2, 2), np.float32)
    sd["rot2xyz.smpl_model.v_template"] = np.zeros((4, 3), np.float32)
    sd["sequence_pos_encoder.pe"] = np.zeros((10, 1, 8), np.float32)
    C.convert_cmdm(sd, "online")


@pytest.mark.fast
def test_cmdm_converter_wrong_arch_fails_loudly():
    """Converting an online (decoder) checkpoint as offline must raise —
    the decoder weights would otherwise be silently dropped."""
    with pytest.raises(ValueError, match="unconsumed"):
        C.convert_cmdm(_tiny_cmdm_sd(), "offline")


def _tiny_gru_ckpt(I=6, H=8, classes=3):
    rng = np.random.default_rng(1)
    r = lambda *s: torch.tensor(rng.normal(size=s).astype(np.float32))
    return {
        "model": {
            "recurrent.weight_ih_l0": r(3 * H, I),
            "recurrent.weight_hh_l0": r(3 * H, H),
            "recurrent.bias_ih_l0": r(3 * H),
            "recurrent.bias_hh_l0": r(3 * H),
            "linear1.weight": r(H, H),
            "linear1.bias": r(H),
            "linear2.weight": r(classes, H),
            "linear2.bias": r(classes),
        }
    }


@pytest.mark.fast
def test_detect_kind():
    assert C.detect_kind(_tiny_gru_ckpt()) == "gru"
    assert C.detect_kind(_tiny_cmdm_sd()) == "cmdm/online"
    assert C.detect_kind({"movement_encoder": {}, "text_encoder": {},
                          "motion_encoder": {}}) == "t2m"
    with pytest.raises(ValueError, match="could not identify"):
        C.detect_kind({"something": {}})


@pytest.mark.fast
def test_check_cli_accepts_valid_and_rejects_drifted(tmp_path, capsys):
    good = tmp_path / "gru.tar"
    torch.save(_tiny_gru_ckpt(), good)
    assert C.main(["--check", str(good)]) == 0
    out = capsys.readouterr().out
    assert "valid gru checkpoint" in out and "all keys consumed" in out

    bad_ckpt = _tiny_gru_ckpt()
    bad_ckpt["model"]["unknown.weight"] = torch.zeros(2)
    bad = tmp_path / "bad.tar"
    torch.save(bad_ckpt, bad)
    with pytest.raises(ValueError, match="unconsumed"):
        C.main(["--check", str(bad)])


@pytest.mark.fast
def test_load_checkpoint_routes_torch_files(tmp_path):
    """train.checkpoint.load_checkpoint auto-detects a released torch .pt
    (reference model######.pt layout) and returns converted params, so the
    sampling/eval CLIs accept released weights directly; model_util picks
    the torch-parity exact-GELU activation for such paths."""
    import types

    import jax

    from regennet_tpu.train import checkpoint
    from regennet_tpu.utils.model_util import _pick_activation

    sd = _tiny_cmdm_sd()
    path = str(tmp_path / "model000000123.pt")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    restored = checkpoint.load_checkpoint(path, {"params": None})
    want = C.convert_cmdm(dict(sd), "online")
    got = jax.device_get(restored["params"])
    flat_w = jax.tree_util.tree_leaves_with_path(want)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(flat_w) == len(flat_g)
    for k, v in flat_w:
        np.testing.assert_allclose(flat_g[k], v, atol=0)

    # wrong target key fails loudly
    with pytest.raises(ValueError, match="lacks"):
        checkpoint.load_checkpoint(path, {"opt_state": None})

    # activation routing: torch file -> exact erf; orbax dir -> default
    assert _pick_activation(
        types.SimpleNamespace(model_path=path)
    ) == "gelu_exact"
    assert _pick_activation(
        types.SimpleNamespace(model_path=str(tmp_path))
    ) == "gelu"
    assert _pick_activation(
        types.SimpleNamespace(model_path=path, activation="relu")
    ) == "relu"

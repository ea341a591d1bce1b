"""TPU-native CLIP text path: flax tower + converter (both released
layouts) + re-derived BPE tokenizer (reference: model/cmdm.py:94-166)."""

import gzip
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from regennet_tpu.convert.torch_ckpt import (  # noqa: E402
    convert_clip_text,
    convert_clip_text_checkpoint,
)
from regennet_tpu.models.clip_text_flax import ClipTextTransformer  # noqa: E402


def _tiny_hf(seed=0, vocab_size=120):
    from transformers import CLIPTextConfig, CLIPTextModelWithProjection

    torch.manual_seed(seed)
    cfg = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=32, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=16, projection_dim=24,
        eos_token_id=vocab_size - 1,
    )
    return CLIPTextModelWithProjection(cfg).eval()


def _tokens():
    t = np.zeros((2, 16), np.int64)
    t[0, :2] = [5, 119]
    t[1, :3] = [5, 7, 119]
    return t


def _to_openai_layout(sd, layers):
    """Rename an HF text-tower state dict into the OpenAI ViT-B-32.pt key
    layout (packed attn in_proj, resblocks, matrix text_projection)."""
    oa = {
        "token_embedding.weight":
            sd["text_model.embeddings.token_embedding.weight"],
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final.weight": sd["text_model.final_layer_norm.weight"],
        "ln_final.bias": sd["text_model.final_layer_norm.bias"],
        "text_projection": sd["text_projection.weight"].T.copy(),
        "logit_scale": np.zeros(()),
        "visual.conv1.weight": np.zeros((2, 2)),  # vision tower: ignored
    }
    ren = {"layer_norm1": "ln_1", "layer_norm2": "ln_2"}
    for i in range(layers):
        p = f"text_model.encoder.layers.{i}"
        q = f"transformer.resblocks.{i}"
        oa[f"{q}.attn.in_proj_weight"] = np.concatenate(
            [sd[f"{p}.self_attn.{n}_proj.weight"] for n in "qkv"]
        )
        oa[f"{q}.attn.in_proj_bias"] = np.concatenate(
            [sd[f"{p}.self_attn.{n}_proj.bias"] for n in "qkv"]
        )
        oa[f"{q}.attn.out_proj.weight"] = sd[
            f"{p}.self_attn.out_proj.weight"
        ]
        oa[f"{q}.attn.out_proj.bias"] = sd[f"{p}.self_attn.out_proj.bias"]
        for hf_ln, oa_ln in ren.items():
            oa[f"{q}.{oa_ln}.weight"] = sd[f"{p}.{hf_ln}.weight"]
            oa[f"{q}.{oa_ln}.bias"] = sd[f"{p}.{hf_ln}.bias"]
        oa[f"{q}.mlp.c_fc.weight"] = sd[f"{p}.mlp.fc1.weight"]
        oa[f"{q}.mlp.c_fc.bias"] = sd[f"{p}.mlp.fc1.bias"]
        oa[f"{q}.mlp.c_proj.weight"] = sd[f"{p}.mlp.fc2.weight"]
        oa[f"{q}.mlp.c_proj.bias"] = sd[f"{p}.mlp.fc2.bias"]
    return oa


class TestFlaxTower:
    def test_matches_hf_with_projection(self):
        """text_embeds parity: the reference's encode_text goes THROUGH
        text_projection (model/cmdm.py:166 via CLIP.encode_text); the flax
        tower must match CLIPTextModelWithProjection, not pooler_output."""
        m = _tiny_hf()
        tokens = _tokens()
        with torch.no_grad():
            want = m(input_ids=torch.from_numpy(tokens)).text_embeds.numpy()
        state = convert_clip_text(
            {k: v.numpy() for k, v in m.state_dict().items()}
        )
        ours = ClipTextTransformer(
            vocab_size=120, context_length=16, dim=32, heads=4,
            num_layers=3, proj_dim=24,
        )
        got = np.asarray(ours.apply(state, jnp.asarray(tokens, jnp.int32)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_openai_layout_matches_hf_layout(self):
        m = _tiny_hf()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        state_hf = convert_clip_text(sd)
        state_oa = convert_clip_text(_to_openai_layout(sd, 3))
        for k in state_hf["params"]:
            a = jax.tree_util.tree_leaves(state_hf["params"][k])
            b = jax.tree_util.tree_leaves(state_oa["params"][k])
            for x, y in zip(a, b):
                np.testing.assert_allclose(x, y, atol=1e-6)

    def test_converter_rejects_unconsumed_keys(self):
        m = _tiny_hf()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        sd["text_model.encoder.layers.0.self_attn.extra"] = np.zeros(3)
        with pytest.raises(ValueError, match="unconsumed"):
            convert_clip_text(sd)

    def test_pt_file_route_and_detect(self, tmp_path):
        from regennet_tpu.convert.torch_ckpt import check_checkpoint

        m = _tiny_hf()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        path = str(tmp_path / "ViT-B-32.pt")
        torch.save(
            {k: torch.from_numpy(np.asarray(v))
             for k, v in _to_openai_layout(sd, 3).items()},
            path,
        )
        state = convert_clip_text_checkpoint(path)
        assert "block_2" in state["params"]
        assert check_checkpoint(path)["kind"] == "clip_text"


def _write_tiny_bpe(tmp_path):
    """A tiny merge table + the equivalent HF CLIPTokenizer files built
    from the same data, so both tokenizers share one vocabulary."""
    merges = [
        ("h", "e"), ("l", "l"), ("o", "</w>"), ("he", "ll"),
        ("hell", "o</w>"), ("w", "a"), ("l", "k"), ("wa", "lk"),
        ("s", "</w>"), ("walk", "s</w>"),
    ]
    gz = str(tmp_path / "bpe_simple_vocab_16e6.txt.gz")
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))

    from regennet_tpu.data.clip_bpe import SOT, EOT, bytes_to_unicode

    byte_syms = list(bytes_to_unicode().values())
    vocab = byte_syms + [s + "</w>" for s in byte_syms]
    vocab += ["".join(m) for m in merges]
    vocab += [SOT, EOT]
    vocab_file = str(tmp_path / "vocab.json")
    with open(vocab_file, "w") as f:
        json.dump({tok: i for i, tok in enumerate(vocab)}, f)
    merges_file = str(tmp_path / "merges.txt")
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges) + "\n")
    return gz, vocab_file, merges_file


class TestBpeTokenizer:
    def test_matches_hf_clip_tokenizer(self, tmp_path):
        from transformers import CLIPTokenizer as HFTok

        from regennet_tpu.data.clip_bpe import ClipTokenizer

        gz, vocab_file, merges_file = _write_tiny_bpe(tmp_path)
        ours = ClipTokenizer(gz)
        hf = HFTok(vocab_file, merges_file)
        for text in ["hello hello", "a person walks", "Hello, WORLD!!",
                     "he walks fast"]:
            got = [ours.sot_id] + ours.encode(text) + [ours.eot_id]
            want = hf(text).input_ids
            assert got == want, (text, got, want)

    def test_tokenize_pads_and_truncates_like_clip(self, tmp_path):
        from regennet_tpu.data.clip_bpe import ClipTokenizer

        gz, _, _ = _write_tiny_bpe(tmp_path)
        tok = ClipTokenizer(gz)
        out = tok.tokenize(["hello"], context_length=8)
        assert out.shape == (1, 8)
        assert out[0, 0] == tok.sot_id
        assert tok.eot_id in out[0]
        # zero padding after EOT (clip.tokenize semantics)
        eot_pos = int(np.argmax(out[0] == tok.eot_id))
        assert (out[0, eot_pos + 1:] == 0).all()
        # truncation keeps EOT as the final token
        long = " ".join(["hello"] * 20)
        with pytest.raises(RuntimeError):
            tok.tokenize([long], context_length=8)
        t = tok.tokenize([long], context_length=8, truncate=True)
        assert t[0, -1] == tok.eot_id

    def test_decode_round_trip(self, tmp_path):
        from regennet_tpu.data.clip_bpe import ClipTokenizer

        gz, _, _ = _write_tiny_bpe(tmp_path)
        tok = ClipTokenizer(gz)
        assert tok.decode(tok.encode("hello walks")) == "hello walks"

    def test_missing_table_raises_clearly(self):
        from regennet_tpu.data.clip_bpe import ClipTokenizer

        with pytest.raises(RuntimeError, match="REGENNET_CLIP_BPE"):
            ClipTokenizer("/nonexistent/bpe.gz")


class TestEncoderRoute:
    def test_openai_pt_file_drop_end_to_end(self, tmp_path, monkeypatch):
        """The 'one file-drop away' contract: given only the OpenAI-layout
        .pt and the public merge table, ClipTextEncoder tokenizes and
        encodes through the jitted flax tower."""
        from regennet_tpu.models.clip_text import ClipTextEncoder

        # vocab must cover the tiny BPE table's id space (256*2 byte
        # symbols + 10 merges + 2 specials = 524)
        m = _tiny_hf(vocab_size=524)
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        path = str(tmp_path / "ViT-B-32.pt")
        torch.save(
            {k: torch.from_numpy(np.asarray(v))
             for k, v in _to_openai_layout(sd, 3).items()},
            path,
        )
        gz, _, _ = _write_tiny_bpe(tmp_path)
        monkeypatch.setenv("REGENNET_CLIP_BPE", gz)
        enc = ClipTextEncoder(model_path=path, max_text_len=6)
        out = enc(["hello walks", "hello hello hello"])
        assert out.shape == (2, 24)
        assert np.isfinite(out).all()
        # distinct prompts -> distinct embeddings
        assert np.abs(out[0] - out[1]).max() > 1e-5

"""Convert reference PyTorch checkpoints to this framework's parameter trees.

Two converters:
  * `convert_cmdm(state_dict, ...)` — reference `model######.pt` denoiser
    weights (torch nn.TransformerDecoder/Encoder layout, reference:
    model/cmdm.py) -> Flax CMDM params. Validates FID parity against
    released checkpoints without retraining.
  * `convert_stgcn(state_dict, ...)` — reference recognition classifier
    `checkpoint_####.pth.tar` (reference: eval/a2m/recognition/models/
    stgcn.py) -> Flax STGCN {params, batch_stats}.

torch (CPU build) is only imported inside `load_torch_state_dict`, so the
rest of the framework never depends on it.
"""

from __future__ import annotations

from typing import Dict, Iterable

import numpy as np


class _TrackedSD(dict):
    """State dict that records which keys a converter consumed, so layout
    drift against released files fails loudly instead of silently dropping
    weights (mirrors the reference's load_model_wo_clip assert contract,
    utils/model_util.py:5-8)."""

    def __init__(self, sd):
        super().__init__(sd)
        self.used: set = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


# keys a converter may legitimately leave unconsumed: frozen CLIP tower
# (stripped by reference saves but present in ad-hoc dumps), body-model
# buffers riding inside CMDM (rot2xyz.smpl_model.*), deterministic
# positional-encoding buffers, BN bookkeeping, and the ST-GCN adjacency
# buffer (rebuilt from the layout).
_IGNORABLE_PREFIXES = ("clip_model.", "rot2xyz.")
_IGNORABLE_SUFFIXES = ("num_batches_tracked", "sequence_pos_encoder.pe", ".pe")
_IGNORABLE_EXACT = ("A", "pe")


def _assert_coverage(sd, what: str, extra_ignored: Iterable[str] = ()):
    if not isinstance(sd, _TrackedSD):
        return
    extra = tuple(extra_ignored)
    left = sorted(
        k
        for k in sd
        if k not in sd.used
        and not k.startswith(_IGNORABLE_PREFIXES)
        and not k.endswith(_IGNORABLE_SUFFIXES)
        and k not in _IGNORABLE_EXACT + extra
    )
    if left:
        raise ValueError(
            f"{what} converter left {len(left)} checkpoint keys unconsumed "
            f"(layout mismatch against this release?): {left[:10]}"
            + (" ..." if len(left) > 10 else "")
        )


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # a2m GRU classifier tars nest under 'model'
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def _layernorm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd, prefix):
    """torch packed in_proj -> q/k/v/out Dense params."""
    w = sd[f"{prefix}.in_proj_weight"]  # [3D, D]
    b = sd[f"{prefix}.in_proj_bias"]
    D = w.shape[1]
    out = {}
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        out[name] = {
            "kernel": np.ascontiguousarray(w[i * D : (i + 1) * D].T),
            "bias": b[i * D : (i + 1) * D],
        }
    out["out_proj"] = _dense(sd, f"{prefix}.out_proj")
    return out


def convert_cmdm(sd: Dict[str, np.ndarray], arch: str = "online") -> Dict:
    """Reference CMDM state_dict -> Flax params dict (matching models/cmdm)."""
    sd = _TrackedSD(sd)
    params: Dict = {}
    params["input_process"] = _dense(sd, "input_process.poseEmbedding")
    params["cmo_process"] = _dense(sd, "cmo_process.poseEmbedding")
    if "fuse_process.weight" in sd:
        params["fuse_process"] = _dense(sd, "fuse_process")
    params["embed_timestep"] = {
        "fc1": _dense(sd, "embed_timestep.time_embed.0"),
        "fc2": _dense(sd, "embed_timestep.time_embed.2"),
    }
    if "embed_action.action_embedding" in sd:
        params["action_embedding"] = sd["embed_action.action_embedding"]
    if "embed_text.weight" in sd:
        params["embed_text"] = _dense(sd, "embed_text")
    params["output_process"] = _dense(sd, "output_process.poseFinal")

    if arch in ("online", "trans_dec"):
        trunk = "seqTransDecoder"
        layers = {}
        i = 0
        while f"{trunk}.layers.{i}.self_attn.in_proj_weight" in sd:
            p = f"{trunk}.layers.{i}"
            layers[f"layer_{i}"] = {
                "self_attn": _mha(sd, f"{p}.self_attn"),
                "cross_attn": _mha(sd, f"{p}.multihead_attn"),
                "ff": {
                    "linear1": _dense(sd, f"{p}.linear1"),
                    "linear2": _dense(sd, f"{p}.linear2"),
                },
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
                "norm3": _layernorm(sd, f"{p}.norm3"),
            }
            i += 1
        params["decoder"] = layers
    elif arch in ("offline", "trans_enc"):
        trunk = "seqTransEncoder"
        layers = {}
        i = 0
        while f"{trunk}.layers.{i}.self_attn.in_proj_weight" in sd:
            p = f"{trunk}.layers.{i}"
            layers[f"layer_{i}"] = {
                "self_attn": _mha(sd, f"{p}.self_attn"),
                "ff": {
                    "linear1": _dense(sd, f"{p}.linear1"),
                    "linear2": _dense(sd, f"{p}.linear2"),
                },
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
            }
            i += 1
        params["encoder"] = layers
    elif arch == "gru":
        # reference: model/cmdm.py:82-84 — nn.GRU(latent, latent, L) maps to
        # our stacked nn.RNN(GRUCell) trunk (params surface as GRUCell_{i})
        i = 0
        while f"gru.weight_ih_l{i}" in sd:
            params[f"GRUCell_{i}"] = _gru_cell(sd, "gru", layer=i)
            i += 1
        if i == 0:
            raise NotImplementedError("no gru.* weights in this checkpoint")
    elif arch == "mlp":
        # reference: model/mlp.py MLPblock — fc0 is Conv1d(seq, seq, 1)
        # mixing over the time axis == our time_mix Dense on swapped axes
        i = 0
        while f"mlp.motion_mlp.mlps.{i}.fc0.weight" in sd:
            p = f"mlp.motion_mlp.mlps.{i}"
            blk = {
                "emb_fc": _dense(sd, f"{p}.emb_fc"),
                "fc1": _dense(sd, f"{p}.fc1"),
                "norm0": _layernorm(sd, f"{p}.norm0"),
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "time_mix": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{p}.fc0.weight"][:, :, 0].T
                    ),
                    "bias": sd[f"{p}.fc0.bias"],
                },
            }
            if f"{p}.conct.weight" in sd:
                blk["concat_proj"] = _dense(sd, f"{p}.conct")
            params[f"mlp_{i}"] = blk
            i += 1
        if i == 0:
            raise NotImplementedError("no mlp.* weights in this checkpoint")
    else:
        raise NotImplementedError(f"converter for arch={arch}")
    _assert_coverage(sd, "CMDM")
    return params


def _conv_nhwc(sd, prefix):
    """torch Conv2d [C_out, C_in, kH, kW] -> flax [kH, kW, C_in, C_out]."""
    return {
        "kernel": np.ascontiguousarray(
            np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))
        ),
        "bias": sd[f"{prefix}.bias"],
    }


def _batchnorm(sd, prefix):
    return (
        {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
        {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]},
    )


def convert_stgcn(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference STGCN state_dict -> {'params': ..., 'batch_stats': ...}."""
    sd = _TrackedSD(sd)
    params: Dict = {}
    stats: Dict = {}

    p, s = _batchnorm(sd, "data_bn")
    params["data_bn"], stats["data_bn"] = p, s

    i = 0
    while f"st_gcn_networks.{i}.gcn.conv.weight" in sd:
        pre = f"st_gcn_networks.{i}"
        blk_p = {"gcn": {"conv": _conv_nhwc(sd, f"{pre}.gcn.conv")}}
        blk_s = {}
        bn0_p, bn0_s = _batchnorm(sd, f"{pre}.tcn.0")
        blk_p["tcn_bn0"], blk_s["tcn_bn0"] = bn0_p, bn0_s
        blk_p["tcn_conv"] = _conv_nhwc(sd, f"{pre}.tcn.2")
        bn1_p, bn1_s = _batchnorm(sd, f"{pre}.tcn.3")
        blk_p["tcn_bn1"], blk_s["tcn_bn1"] = bn1_p, bn1_s
        if f"{pre}.residual.0.weight" in sd:
            blk_p["res_conv"] = _conv_nhwc(sd, f"{pre}.residual.0")
            rp, rs = _batchnorm(sd, f"{pre}.residual.1")
            blk_p["res_bn"], blk_s["res_bn"] = rp, rs
        params[f"st_gcn_{i}"] = blk_p
        stats[f"st_gcn_{i}"] = blk_s
        i += 1

    j = 0
    while f"edge_importance.{j}" in sd:
        params[f"edge_importance_{j}"] = sd[f"edge_importance.{j}"]
        j += 1

    params["fcn"] = _conv_nhwc(sd, "fcn")
    _assert_coverage(sd, "STGCN")
    return {"params": params, "batch_stats": stats}


def _gru_cell(sd, prefix, suffix="", layer=0):
    """One torch GRU direction/layer -> flax GRUCell params.

    torch gate order is (r, z, n); flax folds the torch hidden-side r/z
    biases into the input-side ones (they only ever appear summed) and keeps
    the n-gate hidden bias separate (it sits inside the reset product).
    """
    w_ih = sd[f"{prefix}.weight_ih_l{layer}{suffix}"]
    w_hh = sd[f"{prefix}.weight_hh_l{layer}{suffix}"]
    b_ih = sd[f"{prefix}.bias_ih_l{layer}{suffix}"]
    b_hh = sd[f"{prefix}.bias_hh_l{layer}{suffix}"]
    H = w_hh.shape[1]
    s = lambda m, i: np.ascontiguousarray(m[i * H : (i + 1) * H].T)
    return {
        "ir": {"kernel": s(w_ih, 0), "bias": b_ih[0:H] + b_hh[0:H]},
        "iz": {"kernel": s(w_ih, 1), "bias": b_ih[H:2 * H] + b_hh[H:2 * H]},
        "in": {"kernel": s(w_ih, 2), "bias": b_ih[2 * H:]},
        "hr": {"kernel": s(w_hh, 0)},
        "hz": {"kernel": s(w_hh, 1)},
        "hn": {"kernel": s(w_hh, 2), "bias": b_hh[2 * H:]},
    }


def _bigru_co(sd, prefix=""):
    """torch {TextEncoder,MotionEncoder}BiGRUCo trunk -> flax _BiGRUCo."""
    p = f"{prefix}." if prefix else ""
    return {
        "hidden": sd[f"{p}hidden"],
        "fwd_cell": _gru_cell(sd, f"{p}gru"),
        "bwd_cell": _gru_cell(sd, f"{p}gru", "_reverse"),
        "out1": _dense(sd, f"{p}output_net.0"),
        "out_ln": _layernorm(sd, f"{p}output_net.1"),
        "out2": _dense(sd, f"{p}output_net.3"),
    }


def _conv1d_nlc(sd, prefix):
    """torch Conv1d [C_out, C_in, k] -> flax Conv kernel [k, C_in, C_out]."""
    return {
        "kernel": np.ascontiguousarray(
            np.transpose(sd[f"{prefix}.weight"], (2, 1, 0))
        ),
        "bias": sd[f"{prefix}.bias"],
    }


def convert_gru_classifier(ckpt: Dict) -> Dict:
    """Released a2m GRU action classifier (e.g. humanact12_gru.tar) ->
    models/gru_classifier.MotionDiscriminator params.

    reference: eval/a2m/action2motion/models.py:6-80 — torch module with a
    stacked nn.GRU(`recurrent`, layers l0/l1/...) + linear1/linear2 head;
    the released file stores the state dict under 'model'
    (load_classifier `:67-73`).
    """
    sd = ckpt.get("model", ckpt)
    sd = _TrackedSD({k: np.asarray(v) for k, v in sd.items()})
    params = {}
    i = 0
    while f"recurrent.weight_ih_l{i}" in sd:
        params[f"GRUCell_{i}"] = _gru_cell(sd, "recurrent", layer=i)
        i += 1
    params["linear1"] = _dense(sd, "linear1")
    params["linear2"] = _dense(sd, "linear2")
    _assert_coverage(sd, "GRU classifier")
    return {"params": params}


def convert_t2m_evaluator(ckpt: Dict) -> Dict:
    """Released t2m `finest.tar` (keys movement_encoder / text_encoder /
    motion_encoder state dicts) -> T2MEvaluatorWrapper variables."""

    def flat(sub):
        return _TrackedSD(
            {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
             for k, v in sub.items()}
        )

    mov = flat(ckpt["movement_encoder"])
    text = flat(ckpt["text_encoder"])
    mot = flat(ckpt["motion_encoder"])
    out = {
        "movement": {
            "conv1": _conv1d_nlc(mov, "main.0"),
            "conv2": _conv1d_nlc(mov, "main.3"),
            "out_net": _dense(mov, "out_net"),
        },
        "text": {
            "pos_emb": _dense(text, "pos_emb"),
            "input_emb": _dense(text, "input_emb"),
            "bigru": _bigru_co(text),
        },
        "motion": {
            "input_emb": _dense(mot, "input_emb"),
            "bigru": _bigru_co(mot),
        },
    }
    for name, sub in [("movement_encoder", mov), ("text_encoder", text),
                      ("motion_encoder", mot)]:
        _assert_coverage(sub, f"t2m evaluator {name}")
    return out


def _gru_cell_single(sd, prefix):
    """torch nn.GRUCell (same gate layout as nn.GRU's l0, but keys lack the
    _l{layer} suffix) -> flax GRUCell via the shared _gru_cell slicer."""
    adapted = {
        f"{prefix}.{name}_l0": sd[f"{prefix}.{name}"]
        for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")
    }
    return _gru_cell(adapted, prefix)


def _conv_transpose1d(sd, prefix):
    """torch ConvTranspose1d [C_in, C_out, k] -> flax ConvTranspose kernel
    [k, C_in, C_out] with the spatial axis FLIPPED (validated exact for
    k=4, s=2, p=1 vs flax padding='SAME')."""
    w = np.asarray(sd[f"{prefix}.weight"])
    return {
        "kernel": np.ascontiguousarray(np.transpose(w, (2, 0, 1))[::-1]),
        "bias": sd[f"{prefix}.bias"],
    }


def _comp_seq_cell(sd) -> Dict:
    """Shared layout of the comp_v6 prior/posterior/decoder GRU cells
    (reference: networks/modules.py TextDecoder:187-229 /
    TextVAEDecoder:123-184)."""
    out = {
        "z2init": _dense(sd, "z2init"),
        "emb_dense": _dense(sd, "emb.0"),
        "emb_ln": _layernorm(sd, "emb.1"),
    }
    i = 0
    while f"gru.{i}.weight_ih" in sd:
        out[f"gru_{i}"] = _gru_cell_single(sd, f"gru.{i}")
        i += 1
    if "mu_net.weight" in sd:  # TextDecoder (prior/posterior)
        out["mu_net"] = _dense(sd, "mu_net")
        out["logvar_net"] = _dense(sd, "logvar_net")
    else:  # TextVAEDecoder (snippet decoder)
        out["out1"] = _dense(sd, "output.0")
        out["out_ln"] = _layernorm(sd, "output.1")
        out["out2"] = _dense(sd, "output.3")
    return out


def _comp_seq_cell_checked(sd, name):
    out = _comp_seq_cell(sd)
    _assert_coverage(sd, f"comp_v6 {name}")
    return out


def convert_comp_v6(ckpt: Dict) -> Dict:
    """Released T2M generator checkpoint (e.g. Comp_v6_KLD01 latest.tar,
    keys text_enc/seq_{pri,post,dec}/att_layer/mov_{enc,dec} — reference:
    networks/trainers.py CompTrainerV6.save:553-579) ->
    {params: CompV6Generator params, movement_enc: MovementConvEncoder
    params} consumable by eval_humanml's comp route."""

    def flat(sub):
        return _TrackedSD(
            {k: np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)
             for k, v in sub.items()}
        )

    text = flat(ckpt["text_enc"])
    mov_enc = flat(ckpt["mov_enc"])
    mov_dec = flat(ckpt["mov_dec"])
    att = flat(ckpt["att_layer"])
    params = {
        "text_enc": {
            "pos_emb": _dense(text, "pos_emb"),
            "input_emb": _dense(text, "input_emb"),
            "hidden": text["hidden"],
            "fwd_cell": _gru_cell(text, "gru"),
            "bwd_cell": _gru_cell(text, "gru", "_reverse"),
        },
        "att_layer": {
            "W_q": _dense(att, "W_q"),
            "W_k": {"kernel": np.ascontiguousarray(att["W_k.weight"].T)},
            "W_v": _dense(att, "W_v"),
        },
        "seq_pri": _comp_seq_cell_checked(flat(ckpt["seq_pri"]), "seq_pri"),
        "seq_post": _comp_seq_cell_checked(flat(ckpt["seq_post"]),
                                           "seq_post"),
        "seq_dec": _comp_seq_cell_checked(flat(ckpt["seq_dec"]), "seq_dec"),
        "mov_dec": {
            "deconv1": _conv_transpose1d(mov_dec, "main.0"),
            "deconv2": _conv_transpose1d(mov_dec, "main.2"),
            "out_net": _dense(mov_dec, "out_net"),
        },
    }
    movement_enc = {
        "conv1": _conv1d_nlc(mov_enc, "main.0"),
        "conv2": _conv1d_nlc(mov_enc, "main.3"),
        "out_net": _dense(mov_enc, "out_net"),
    }
    for name, sub in [("text_enc", text), ("att_layer", att),
                      ("mov_enc", mov_enc), ("mov_dec", mov_dec)]:
        _assert_coverage(sub, f"comp_v6 {name}")
    return {"params": params, "movement_enc": movement_enc}


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict:
    """CLIP text tower weights -> models/clip_text_flax.ClipTextTransformer
    params, from either layout:

      * HF `CLIPTextModelWithProjection` (`text_model.encoder.layers.N...`
        + `text_projection.weight`), or
      * the original OpenAI `ViT-B-32.pt` state dict that `clip.load`
        caches (`transformer.resblocks.N...` with packed attn in_proj +
        `text_projection` matrix; vision-tower keys ignored) —
        reference: model/cmdm.py:116-127 loads exactly that file.

    Key coverage is enforced (vision/logit keys are ignorable for the
    OpenAI layout)."""
    sd = _TrackedSD({k: np.asarray(v) for k, v in sd.items()})
    openai = any(k.startswith("transformer.resblocks.") for k in sd)

    params: Dict[str, object] = {}
    if openai:
        params["token_embedding"] = sd["token_embedding.weight"]
        params["positional_embedding"] = sd["positional_embedding"]
        i = 0
        while f"transformer.resblocks.{i}.ln_1.weight" in sd:
            p = f"transformer.resblocks.{i}"
            block = _mha(sd, f"{p}.attn")
            block["ln_1"] = _layernorm(sd, f"{p}.ln_1")
            block["ln_2"] = _layernorm(sd, f"{p}.ln_2")
            block["fc1"] = _dense(sd, f"{p}.mlp.c_fc")
            block["fc2"] = _dense(sd, f"{p}.mlp.c_proj")
            params[f"block_{i}"] = block
            i += 1
        params["ln_final"] = _layernorm(sd, "ln_final")
        # OpenAI stores the projection as a right-multiplied matrix [D, P]
        params["text_projection"] = np.ascontiguousarray(
            sd["text_projection"]
        )
        _assert_coverage(
            sd, "CLIP text (openai layout)",
            extra_ignored=[k for k in sd if k.startswith("visual.")]
            + ["logit_scale", "input_resolution", "context_length",
               "vocab_size"],
        )
    else:
        tm = "text_model."
        params["token_embedding"] = sd[
            f"{tm}embeddings.token_embedding.weight"
        ]
        params["positional_embedding"] = sd[
            f"{tm}embeddings.position_embedding.weight"
        ]
        i = 0
        while f"{tm}encoder.layers.{i}.layer_norm1.weight" in sd:
            p = f"{tm}encoder.layers.{i}"
            block = {
                name: _dense(sd, f"{p}.self_attn.{name}")
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            }
            block["ln_1"] = _layernorm(sd, f"{p}.layer_norm1")
            block["ln_2"] = _layernorm(sd, f"{p}.layer_norm2")
            block["fc1"] = _dense(sd, f"{p}.mlp.fc1")
            block["fc2"] = _dense(sd, f"{p}.mlp.fc2")
            params[f"block_{i}"] = block
            i += 1
        params["ln_final"] = _layernorm(sd, f"{tm}final_layer_norm")
        # HF stores a Linear weight [P, D] applied as x @ W.T
        params["text_projection"] = np.ascontiguousarray(
            sd["text_projection.weight"].T
        )
        _assert_coverage(
            sd, "CLIP text (hf layout)",
            extra_ignored=[k for k in sd if "position_ids" in k],
        )
    if not params.get("block_0"):
        raise ValueError("no transformer blocks found in CLIP state dict")
    return {"params": params}


def convert_clip_text_checkpoint(path: str) -> Dict:
    """Load a CLIP checkpoint file (.pt — either a plain state dict or the
    torch.jit archive `clip.load` caches — or an HF .bin) and convert the
    text tower."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except RuntimeError:
        # the cached ViT-B-32.pt is a TorchScript archive
        obj = torch.jit.load(path, map_location="cpu").state_dict()
    if not isinstance(obj, dict):
        obj = obj.state_dict()
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return convert_clip_text(
        {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
         for k, v in obj.items()}
    )


def convert_length_estimator(ckpt: Dict) -> Dict:
    """Released length_est_bigru `latest.tar` (state dict under
    'estimator'; reference trainers.py:766-773 save layout) ->
    models/t2m_eval.MotionLenEstimatorBiGRU params.

    reference: data_loaders/humanml/networks/modules.py:389-420 — pos/input
    Linears, a bidirectional nn.GRU with a learned initial hidden, and a
    Sequential head (Linear/LN/LeakyReLU x3 at indices 0/1, 3/4, 6/7,
    final Linear at 9)."""
    sd = ckpt.get("estimator", ckpt)
    sd = _TrackedSD(
        {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                       else v)
         for k, v in sd.items()}
    )
    params = {
        "pos_emb": _dense(sd, "pos_emb"),
        "input_emb": _dense(sd, "input_emb"),
        "hidden": sd["hidden"],
        "fwd_cell": _gru_cell(sd, "gru"),
        "bwd_cell": _gru_cell(sd, "gru", "_reverse"),
        "head_0": _dense(sd, "output.0"),
        "head_ln_0": _layernorm(sd, "output.1"),
        "head_1": _dense(sd, "output.3"),
        "head_ln_1": _layernorm(sd, "output.4"),
        "head_2": _dense(sd, "output.6"),
        "head_ln_2": _layernorm(sd, "output.7"),
        "head_out": _dense(sd, "output.9"),
    }
    _assert_coverage(sd, "length estimator")
    return {"params": params}


def convert_length_estimator_checkpoint(tar_path: str) -> Dict:
    import torch

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    return convert_length_estimator(ckpt)


def convert_comp_v6_checkpoint(tar_path: str) -> Dict:
    import torch

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    return convert_comp_v6(ckpt)


def convert_cmdm_checkpoint(pt_path: str, arch: str = "online") -> Dict:
    return convert_cmdm(load_torch_state_dict(pt_path), arch)


def convert_t2m_checkpoint(tar_path: str) -> Dict:
    import torch

    ckpt = torch.load(tar_path, map_location="cpu", weights_only=False)
    return convert_t2m_evaluator(ckpt)


def convert_stgcn_checkpoint(pt_path: str) -> Dict:
    return convert_stgcn(load_torch_state_dict(pt_path))


def convert_actor_cvae(sd: Dict, arch: str = "transformer") -> Dict:
    """Released ACTOR CVAE checkpoint (actor-x `checkpoint_####.pth.tar`
    — a flat model state dict with encoder./decoder. prefixes, reference:
    actor-x/src/models/modeltype/cae.py:14-15 + evaluate/stgcn_eval.py:112)
    -> models/actor_cvae.ActorCVAE params.

    arch selects the family: 'transformer' (the released ACTOR
    architecture), 'fc', 'gru', the re-export recombinations 'grutrans'
    (gru encoder + transformer decoder) / 'transgru' (transformer encoder
    + gru decoder), and 'autotrans' (transformer encoder + joeynmt
    pre-norm autoregressive decoder) — reference
    architectures/{transformer,fc,gru,grutrans,transgru,autotrans}.py.
    Positional-encoding buffers are deterministic and ignored."""
    sd = _TrackedSD({k: np.asarray(v.detach().cpu().numpy()
                                   if hasattr(v, "detach") else v)
                     for k, v in sd.items()})

    def trans_layers(trunk, with_cross):
        layers = {}
        i = 0
        while f"{trunk}.layers.{i}.self_attn.in_proj_weight" in sd:
            p = f"{trunk}.layers.{i}"
            layer = {
                "self_attn": _mha(sd, f"{p}.self_attn"),
                "ff": {
                    "linear1": _dense(sd, f"{p}.linear1"),
                    "linear2": _dense(sd, f"{p}.linear2"),
                },
                "norm1": _layernorm(sd, f"{p}.norm1"),
                "norm2": _layernorm(sd, f"{p}.norm2"),
            }
            if with_cross:
                layer["cross_attn"] = _mha(sd, f"{p}.multihead_attn")
                layer["norm3"] = _layernorm(sd, f"{p}.norm3")
            layers[f"layer_{i}"] = layer
            i += 1
        if not layers:
            raise ValueError(f"no transformer layers under {trunk} "
                             "(wrong arch for this ACTOR checkpoint?)")
        return layers

    def gru_stack(side, torch_side):
        out = {}
        i = 0
        while f"{torch_side}.gru.weight_ih_l{i}" in sd:
            out[f"{side}_gru_{i}"] = {
                "cell": _gru_cell(sd, f"{torch_side}.gru", layer=i)
            }
            i += 1
        return out

    def encoder_params(kind):
        if kind == "fc":
            return {
                "enc_fc1": _dense(sd, "encoder.fully_connected.0"),
                "enc_fc2": _dense(sd, "encoder.fully_connected.2"),
                "enc_mu": _dense(sd, "encoder.mu"),
                "enc_var": _dense(sd, "encoder.var"),
            }
        if kind == "gru":
            return {
                "enc_embed": _dense(sd, "encoder.feats_embedding"),
                "enc_mu": _dense(sd, "encoder.mu"),
                "enc_var": _dense(sd, "encoder.var"),
                **gru_stack("enc", "encoder"),
            }
        return {
            "skel_embedding": _dense(sd, "encoder.skelEmbedding"),
            "mu_query": sd["encoder.muQuery"],
            "sigma_query": sd["encoder.sigmaQuery"],
            "encoder": trans_layers("encoder.seqTransEncoder", False),
        }

    def joeynmt_mha(p):
        # joeynmt MultiHeadedAttention: separate q/k/v/output linears
        # (reference tools/transformer_layers.py:34-38)
        return {
            "q_proj": _dense(sd, f"{p}.q_layer"),
            "k_proj": _dense(sd, f"{p}.k_layer"),
            "v_proj": _dense(sd, f"{p}.v_layer"),
            "out_proj": _dense(sd, f"{p}.output_layer"),
        }

    def autotrans_decoder_params():
        # reference architectures/autotrans.py:93-109 + the joeynmt layer
        # stack (tools/transformer_layers.py:216-281); 'decoder.pe.pe' is a
        # deterministic buffer and is ignored
        out = {
            "at_src_embedding": _dense(sd, "decoder.embedding"),
            "at_x_embedding": _dense(sd, "decoder.embedding_x"),
            "at_norm": _layernorm(sd, "decoder.layer_norm"),
            "at_out": {
                "kernel": np.ascontiguousarray(
                    sd["decoder.output_layer.weight"].T
                )
            },
        }
        i = 0
        while f"decoder.layers.{i}.x_layer_norm.weight" in sd:
            p = f"decoder.layers.{i}"
            out[f"at_layer_{i}"] = {
                "x_layer_norm": _layernorm(sd, f"{p}.x_layer_norm"),
                "trg_trg_att": joeynmt_mha(f"{p}.trg_trg_att"),
                "dec_layer_norm": _layernorm(sd, f"{p}.dec_layer_norm"),
                "src_trg_att": joeynmt_mha(f"{p}.src_trg_att"),
                "ff_layer_norm": _layernorm(
                    sd, f"{p}.feed_forward.layer_norm"
                ),
                "pwff1": _dense(sd, f"{p}.feed_forward.pwff_layer.0"),
                "pwff2": _dense(sd, f"{p}.feed_forward.pwff_layer.3"),
            }
            i += 1
        if i == 0:
            raise ValueError(
                "no joeynmt decoder layers under decoder.layers "
                "(wrong arch for this ACTOR checkpoint?)"
            )
        return out

    def decoder_params(kind):
        if kind == "autotrans":
            return autotrans_decoder_params()
        if kind == "fc":
            return {
                "dec_fc1": _dense(sd, "decoder.fully_connected.0"),
                "dec_fc2": _dense(sd, "decoder.fully_connected.2"),
                "dec_out": _dense(sd, "decoder.fully_connected.4"),
            }
        if kind == "gru":
            return {
                "dec_embed": _dense(sd, "decoder.feats_embedding"),
                "dec_out": _dense(sd, "decoder.final_layer"),
                **gru_stack("dec", "decoder"),
            }
        return {
            "action_biases": sd["decoder.actionBiases"],
            "decoder": trans_layers("decoder.seqTransDecoder", True),
            "final_layer": _dense(sd, "decoder.finallayer"),
        }

    from regennet_tpu.models.actor_cvae import ARCH_FAMILIES

    if arch not in ARCH_FAMILIES:
        raise NotImplementedError(f"ACTOR converter for arch={arch}")
    enc_kind, dec_kind = ARCH_FAMILIES[arch]
    params = {**encoder_params(enc_kind), **decoder_params(dec_kind)}
    _assert_coverage(sd, f"ACTOR {arch} CVAE")
    return params


def detect_kind(obj) -> str:
    """Guess which converter a loaded checkpoint object belongs to from its
    key fingerprint. `obj` is the raw torch.load result (dict)."""
    if not isinstance(obj, dict):
        raise ValueError(f"unsupported checkpoint object: {type(obj)}")
    if "movement_encoder" in obj:
        return "t2m"
    if "text_enc" in obj and "mov_dec" in obj:
        return "comp_v6"
    if "estimator" in obj:
        return "length_est"
    if any(
        k.startswith(("transformer.resblocks.", "text_model.encoder."))
        for k in obj.get("state_dict", obj)
    ):
        return "clip_text"
    inner = obj.get("model") if isinstance(obj.get("model"), dict) else None
    keys = set(obj.get("state_dict", inner if inner is not None else obj))
    if any(k.startswith("st_gcn_networks.") for k in keys):
        return "stgcn"
    if any(k.startswith("recurrent.weight_ih_l") for k in keys):
        return "gru"
    if "input_process.poseEmbedding.weight" in keys:
        if any(k.startswith("seqTransDecoder.") for k in keys):
            return "cmdm/online"
        if any(k.startswith("seqTransEncoder.") for k in keys):
            return "cmdm/offline"
        if any(k.startswith("gru.weight_ih_l") for k in keys):
            return "cmdm/gru"
        if any(k.startswith("mlp.motion_mlp.") for k in keys):
            return "cmdm/mlp"
        return "cmdm/offline"
    if any(k.startswith(("encoder.", "decoder.")) for k in keys):
        # ACTOR CVAE/CAE family: pick the arch from the half fingerprints
        enc = (
            "fc" if "encoder.fully_connected.0.weight" in keys
            else "gru" if "encoder.feats_embedding.weight" in keys
            else "transformer" if "encoder.skelEmbedding.weight" in keys
            else None
        )
        dec = (
            "fc" if "decoder.fully_connected.0.weight" in keys
            else "gru" if "decoder.feats_embedding.weight" in keys
            else "transformer" if "decoder.finallayer.weight" in keys
            else "autotrans" if "decoder.embedding_x.weight" in keys
            else None
        )
        pair_to_arch = {
            ("transformer", "transformer"): "transformer",
            ("fc", "fc"): "fc",
            ("gru", "gru"): "gru",
            ("gru", "transformer"): "grutrans",
            ("transformer", "gru"): "transgru",
            ("transformer", "autotrans"): "autotrans",
        }
        if (enc, dec) in pair_to_arch:
            return f"actor/{pair_to_arch[(enc, dec)]}"
    raise ValueError(
        "could not identify checkpoint kind from keys: "
        f"{sorted(keys)[:8]} ..."
    )


def check_checkpoint(path: str, kind: str = "auto") -> Dict[str, object]:
    """Validate a released torch checkpoint's layout WITHOUT model assets:
    load, auto-detect the converter, run it (key-coverage enforced), and
    return a summary. Raises on unconsumed/missing keys."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if kind == "auto":
        kind = detect_kind(obj)
    if kind == "t2m":
        tree = convert_t2m_evaluator(obj)
    elif kind == "comp_v6":
        tree = convert_comp_v6(obj)
    elif kind == "length_est":
        tree = convert_length_estimator(obj)
    elif kind == "clip_text":
        tree = convert_clip_text(
            {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
             for k, v in obj.get("state_dict", obj).items()}
        )
    elif kind == "gru":
        tree = convert_gru_classifier(
            {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
             for k, v in obj.get("model", obj).items()}
        )
    elif kind == "stgcn":
        tree = convert_stgcn(load_torch_state_dict(path))
    elif kind.startswith("actor"):
        arch = kind.split("/", 1)[1] if "/" in kind else "transformer"
        tree = convert_actor_cvae(load_torch_state_dict(path), arch)
    elif kind.startswith("cmdm"):
        arch = kind.split("/", 1)[1] if "/" in kind else "online"
        tree = convert_cmdm(load_torch_state_dict(path), arch)
    else:
        raise ValueError(f"unknown kind {kind!r}")

    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    n_params = sum(int(np.prod(np.shape(v))) for v in leaves)
    return {"kind": kind, "arrays": len(leaves), "parameters": n_params}


def main(argv=None):
    """CLI: `python -m regennet_tpu.convert.torch_ckpt --check file.pt
    [--kind auto|cmdm/{online,offline,gru,mlp}|stgcn|gru|t2m|comp_v6|length_est|
    clip_text|actor/{transformer,fc,gru,grutrans,transgru,autotrans}]` —
    validates a released checkpoint's layout against the converters
    (fails loudly on unconsumed or missing keys)."""
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--check", required=True, metavar="FILE",
                   help="torch checkpoint to validate")
    p.add_argument("--kind", default="auto")
    args = p.parse_args(argv)
    summary = check_checkpoint(args.check, args.kind)
    print(
        f"OK: {args.check} is a valid {summary['kind']} checkpoint "
        f"({summary['arrays']} arrays, {summary['parameters']:,} parameters, "
        "all keys consumed)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Motion inpainting CLI — `python -m regennet_tpu.sample.edit`.

Capability parity with the reference editor (reference: sample/edit.py:
23-199): generates motion while holding part of an input clip fixed through
the diffusion inpainting hook (cond['inpainted_motion'] +
cond['inpainting_mask'], consumed inside p_mean_variance — see
regennet_tpu/diffusion/gaussian.py).

Modes:
  * in_between  — prefix/suffix frames kept, middle generated
    (reference: sample/edit.py:72-79)
  * upper_body  — lower-body joints kept, upper body generated
    (reference: sample/edit.py:80-88); joint partition derived from the
    SMPL/SMPL-X kinematic tree instead of the HumanML mask tables.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import ccollate
from regennet_tpu.diffusion import sampling
from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
from regennet_tpu.sample.cgenerate import init_or_load_params, load_dataset
from regennet_tpu.utils import parser_util
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.rng import sampling_key
from regennet_tpu.utils.model_util import create_model_and_diffusion

# lower-body joint rows (pelvis, hips, knees, ankles, feet) in the SMPL /
# SMPL-X joint ordering, plus the translation row appended at the end
LOWER_BODY_JOINTS = [0, 1, 2, 4, 5, 7, 8, 10, 11]


def build_inpainting_cond(motion: np.ndarray, mode: str, prefix_end: float,
                          suffix_start: float, data_rep: str = "rot6d",
                          lengths=None) -> dict:
    B, J, F, T = motion.shape
    mask = np.zeros(motion.shape, dtype=bool)
    if mode == "in_between":
        # boundaries scale with each sample's own length; the kept suffix
        # runs to max_frames (reference: sample/edit.py:77-81)
        lens = (np.full((B,), T) if lengths is None
                else np.asarray(lengths, np.int64))
        for i, L in enumerate(lens):
            mask[i, :, :, : int(prefix_end * L)] = True
            mask[i, :, :, int(suffix_start * L):] = True
    elif mode == "upper_body":
        if data_rep == "hml_vec":
            # humanml 263-dim feature layout: keep the lower-body dims
            from regennet_tpu.data.humanml.humanml_utils import (
                HML_LOWER_BODY_MASK,
            )

            mask[:, HML_LOWER_BODY_MASK[:J]] = True
        else:
            rows = LOWER_BODY_JOINTS + [J - 1]  # keep translation row too
            mask[:, rows] = True
    else:
        raise ValueError(f"unknown edit mode {mode}")
    return {
        "inpainted_motion": jnp.asarray(motion),
        "inpainting_mask": jnp.asarray(mask),
    }


def main(args=None):
    if args is None:
        parser = parser_util.ArgumentParser()
        parser_util.add_base_options(parser)
        parser_util.add_data_options(parser)
        parser_util.add_sampling_options(parser)
        parser_util.add_edit_options(parser)
        args = parser_util.parse_and_load_from_model_wo_data(parser)
    fixseed(args.seed)

    if not getattr(args, "num_frames", None) or args.num_frames <= 0:
        args.num_frames = {"ntu": 60, "chi3d": 150}.get(args.dataset, 60)

    data = load_dataset(args)
    args.num_actions = data.num_actions
    model, sched, cfg = create_model_and_diffusion(args, data)

    items = [data[i % len(data)] for i in range(args.num_samples)]
    if args.dataset in ("humanml", "kit"):
        # humanml editing (the reference's primary edit path,
        # reference: sample/edit.py): text-conditioned single stream
        from regennet_tpu.data.humanml.dataset import t2m_collate
        from regennet_tpu.models.clip_text import encode_text_or_fallback

        motion, cond_np = t2m_collate(items)
        # the condition text REPLACES the dataset captions; with no text
        # given, generation is forced unconditional via guidance scale 0
        # (reference: sample/edit.py:67-70)
        texts = [args.text_condition] * len(items)
        if args.text_condition == "":
            args.guidance_param = 0.0
        text_emb = encode_text_or_fallback(list(texts))
        cond_np["y"]["cmotion"] = np.zeros_like(motion)
        cond_np["y"]["text_emb"] = text_emb
        cond_np["y"]["action_text"] = texts
    else:
        motion, cond_np = ccollate(items)
    params = init_or_load_params(args, model, (motion, cond_np))
    guidance = float(getattr(args, "guidance_param", 1.0))
    model_fn = (
        make_cfg_model_fn(model, params, guidance)
        if guidance != 1.0 else make_model_fn(model, params)
    )

    cond = {
        "cmotion": jnp.asarray(cond_np["y"]["cmotion"]),
        "mask": jnp.asarray(cond_np["y"]["mask"]),
    }
    if "action" in cond_np["y"]:
        cond["action"] = jnp.asarray(cond_np["y"]["action"])
    if "text_emb" in cond_np["y"]:
        cond["text_emb"] = jnp.asarray(cond_np["y"]["text_emb"])
    cond.update(
        build_inpainting_cond(
            motion, args.edit_mode, args.prefix_end, args.suffix_start,
            data_rep=model.data_rep,
            lengths=cond_np["y"].get("lengths"),
        )
    )

    sampler = sampling.ddim_sample_loop if args.use_ddim else sampling.p_sample_loop
    rng = sampling_key(args.seed)
    sample = np.asarray(
        jax.jit(
            lambda rng: sampler(
                sched, cfg, model_fn, motion.shape, rng, cond,
                clip_denoised=False,
            )
        )(rng)
    )

    out_path = args.output_dir or os.path.join(
        os.path.dirname(args.model_path),
        f"edit_{args.edit_mode}_seed{args.seed}",
    )
    os.makedirs(out_path, exist_ok=True)
    npy_path = os.path.join(out_path, "results.npy")
    np.save(
        npy_path,
        {
            "motion": sample,
            "output": sample,
            "cmotion": np.asarray(cond_np["y"]["cmotion"]),
            "input_motion": motion,
            "inpainting_mask": np.asarray(cond["inpainting_mask"]),
            "text": cond_np["y"].get("action_text", []),
            "lengths": np.asarray(cond_np["y"]["lengths"]),
            "edit_mode": args.edit_mode,
        },
    )
    print(f"saved edit results to [{npy_path}]")
    return npy_path


if __name__ == "__main__":
    main()

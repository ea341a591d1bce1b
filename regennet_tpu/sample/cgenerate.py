"""Conditional generation CLI — `python -m regennet_tpu.sample.cgenerate`.

Capability parity with the reference CLI (reference: sample/cgenerate.py:
23-255): loads model hyperparameters from the checkpoint's args.json, picks
actor ("cmotion") clips per action for each repetition, runs DDPM or DDIM
sampling, smooths temporally, decodes to joints, and writes results.npy with
the same dict layout.

TPU path: the whole diffusion loop runs as one jitted scan; classifier-free
guidance is folded into a single 2B-batched forward. One compile covers all
repetitions (shapes are static).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d

from regennet_tpu.data.collate import ccollate
from regennet_tpu.data.get_data import get_dataset
from regennet_tpu.diffusion import sampling
from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.train import checkpoint
from regennet_tpu.utils import parser_util
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.rng import sampling_key
from regennet_tpu.utils.model_util import create_model_and_diffusion


def load_dataset(args, split="test"):
    return get_dataset(
        name=args.dataset,
        num_frames=args.num_frames if hasattr(args, "num_frames") else -1,
        num_person=args.num_person,
        data_path=args.data_path,
        split=split,
        setting=args.setting,
        pose_rep=args.pose_rep,
        body_model=args.body_model,
    )


def init_or_load_params(args, model, example_batch):
    """Restore params from the checkpoint dir; random-init when the path is
    the literal 'random' (smoke tests / fresh models)."""
    motion, cond_np = example_batch
    x = jnp.asarray(motion)
    cond = {"cmotion": jnp.asarray(cond_np["y"].get("cmotion", motion))}
    if "action" in cond_np["y"]:
        cond["action"] = jnp.asarray(cond_np["y"]["action"])
    else:
        cond["action"] = jnp.zeros((x.shape[0], 1), jnp.int32)
    if "text_emb" in cond_np["y"]:
        cond["text_emb"] = jnp.asarray(cond_np["y"]["text_emb"])
    t = jnp.zeros((x.shape[0],), jnp.int32)
    rng = sampling_key(args.seed)
    params = model.init(rng, x, t, cond)["params"]
    if args.model_path and args.model_path != "random":
        restored = checkpoint.load_checkpoint(args.model_path, {"params": params})
        params = restored["params"]
    return params


def main(args=None):
    if args is None:
        args = parser_util.cgenerate_args()
    fixseed(args.seed)

    if not getattr(args, "num_frames", None) or args.num_frames <= 0:
        args.num_frames = {"ntu": 60, "chi3d": 150}.get(args.dataset, 60)

    out_path = args.output_dir
    if not out_path:
        base = os.path.dirname(args.model_path) or "."
        name = os.path.basename(args.model_path).replace("model", "samples_")
        out_path = os.path.join(
            base, f"{name}_seed{args.seed}"
        )

    print(f"Loading dataset {args.dataset} from {args.data_path} ...")
    data = load_dataset(args)
    args.num_actions = data.num_actions
    # --action_name "name1,name2" / --action_file (one name per line)
    # select the generated classes explicitly; num_samples then follows the
    # name list (reference: sample/cgenerate.py:50-59,95-116 — the
    # reference maps names via dataset.action_name_to_action and draws
    # per-repetition 'appointed' actor motions for each named class)
    action_text = []
    if getattr(args, "action_name", ""):
        action_text = [s for s in args.action_name.split(",") if s]
    elif getattr(args, "action_file", ""):
        with open(args.action_file) as fr:
            action_text = [line.strip() for line in fr if line.strip()]
    fixed_actions = None
    if action_text:
        known = set(getattr(data, "_action_classes", {}).values())
        unknown = [t for t in action_text if known and t not in known]
        if unknown:
            raise ValueError(
                f"unknown action name(s) {unknown}; choose from "
                f"{sorted(known)}"
            )
        fixed_actions = [
            int(a) for a in np.atleast_1d(
                np.asarray(data.action_name_to_action(action_text))
            )
        ]
        args.num_samples = len(fixed_actions)
    total_num_samples = args.num_samples * args.num_repetitions

    print("Creating model and diffusion...")
    model, sched, cfg = create_model_and_diffusion(args, data)

    all_motions, all_output, all_cmotions, all_lengths, all_text = [], [], [], [], []

    rng = sampling_key(args.seed)
    params = None
    sample_jit = None
    times_ms = []

    for rep_i in range(args.num_repetitions):
        print(f"### Sampling [repetitions #{rep_i}]")
        actions = (
            fixed_actions if fixed_actions is not None
            else [i % data.num_actions for i in range(args.num_samples)]
        )
        items = [
            data.get_cmotion(a, mode="appointed", data_index=rep_i) for a in actions
        ]
        motion, cond_np = ccollate(items)
        if params is None:
            params = init_or_load_params(args, model, (motion, cond_np))
            guidance = float(getattr(args, "guidance_param", 1.0))
            if guidance != 1.0:
                model_fn = make_cfg_model_fn(model, params, guidance)
            else:
                model_fn = make_model_fn(model, params)

            sampler = (
                sampling.ddim_sample_loop if args.use_ddim else sampling.p_sample_loop
            )
            shape = motion.shape

            def _run(rng, cond):
                return sampler(
                    sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
                )

            sample_jit = jax.jit(_run)

        cond = {
            "cmotion": jnp.asarray(cond_np["y"]["cmotion"]),
            "action": jnp.asarray(cond_np["y"]["action"]),
            "mask": jnp.asarray(cond_np["y"]["mask"]),
        }
        rng, step_rng = jax.random.split(rng)
        t0 = time.time()
        sample = jax.block_until_ready(sample_jit(step_rng, cond))
        dt = (time.time() - t0) * 1000
        times_ms.append(dt)
        print(f"Generate time: {dt:.1f} ms for {motion.shape[0]} sequences")

        sample_np = gaussian_filter1d(np.asarray(sample), sigma=1, axis=-1)

        body = bm.get_body_model(args.body_model)
        rot2xyz = make_rot2xyz(
            body,
            pose_rep=args.pose_rep,
            jointstype=args.body_model,
            translation=True,
            glob=True,
            vertstrans=True,
        )
        lengths = cond_np["y"]["lengths"]
        mask = np.asarray(cond_np["y"]["mask"])[:, 0, 0].astype(bool)
        joints = np.asarray(rot2xyz(jnp.asarray(sample_np), jnp.asarray(mask)))

        all_output.append(sample_np)
        all_motions.append(joints)
        all_cmotions.append(np.asarray(cond_np["y"]["cmotion"]))
        all_text.append(cond_np["y"]["action_text"])
        all_lengths.append(np.asarray(lengths))

    print(
        f"Average generate time: {np.mean(times_ms):.1f} ms "
        f"({np.mean(times_ms) / max(args.num_samples, 1):.2f} ms/seq)"
    )

    all_motions_np = np.concatenate(all_motions, axis=0)[:total_num_samples]
    all_output_np = np.concatenate(all_output, axis=0)[:total_num_samples]
    all_cmotions_np = np.concatenate(all_cmotions, axis=0)[:total_num_samples]
    all_lengths_np = np.concatenate(all_lengths, axis=0)[:total_num_samples]
    all_text_flat = [t for rep in all_text for t in rep][:total_num_samples]

    os.makedirs(out_path, exist_ok=True)
    npy_path = os.path.join(out_path, "results.npy")
    print(f"saving results file to [{npy_path}]")
    np.save(
        npy_path,
        {
            "motion": all_motions_np,
            "output": all_output_np,
            "cmotion": all_cmotions_np,
            "text": all_text_flat,
            "lengths": all_lengths_np,
            "num_samples": args.num_samples,
            "num_repetitions": args.num_repetitions,
        },
    )
    with open(npy_path.replace(".npy", ".txt"), "w") as fw:
        fw.write("\n".join(all_text_flat))
    with open(npy_path.replace(".npy", "_len.txt"), "w") as fw:
        fw.write("\n".join([str(int(l)) for l in all_lengths_np]))
    return npy_path


if __name__ == "__main__":
    main()

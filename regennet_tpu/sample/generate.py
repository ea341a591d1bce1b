"""Free-text text-to-motion generation —
`python -m regennet_tpu.sample.generate`.

Generate motions for arbitrary text prompts from a trained t2m model —
either an MDM-style diffusion checkpoint (train_mdm --dataset humanml) or
a comp_v6 generator checkpoint (train_t2m_gen / a released latest.tar,
autodetected like eval_humanml). The reference carries no standalone t2m
generation CLI (its t2m stack is eval-only); this completes the in-repo
text-to-motion story: prompts -> RIC features -> recovered joints ->
results.npy (+ optional stick-figure videos).

Prompts come from --text_prompt (one prompt, repeated num_samples times)
or --input_text (a file, one prompt per line).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, type=str,
                   help="checkpoint dir (args.json beside it) or a "
                   "released comp_v6 .tar")
    p.add_argument("--data_path", required=True, type=str,
                   help="dataset root (Mean/Std normalisation stats)")
    p.add_argument("--dataset", default="humanml",
                   choices=["humanml", "kit"])
    p.add_argument("--text_prompt", default="", type=str)
    p.add_argument("--input_text", default="", type=str,
                   help="file with one prompt per line")
    p.add_argument("--num_samples", default=3, type=int,
                   help="with --text_prompt: repetitions of the prompt")
    p.add_argument("--motion_length", default=6.0, type=float,
                   help="seconds (20 fps, capped at the model's window)")
    p.add_argument("--guidance_param", default=2.5, type=float)
    p.add_argument("--output_dir", default="", type=str)
    p.add_argument("--glove_root", default="./glove", type=str,
                   help="GloVe archive dir for comp_v6 word inputs")
    p.add_argument("--length_estimator", default="", type=str,
                   help="length-estimator checkpoint (train_t2m_eval "
                   "--stage length): sample per-prompt lengths from its "
                   "categorical instead of a fixed --motion_length "
                   "(reference: comp_v6_model_dataset.py length sampling)")
    p.add_argument("--render", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="write stick-figure videos per sample")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def _prompts(args):
    if args.input_text:
        with open(args.input_text) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        if not lines:
            raise ValueError(f"no prompts in {args.input_text}")
        return lines
    if not args.text_prompt:
        raise ValueError("pass --text_prompt or --input_text")
    return [args.text_prompt] * args.num_samples


def _word_inputs(prompts, glove_root):
    """Tokenise prompts through the word vectorizer (GloVe when present,
    hashed fallback otherwise) into the evaluator-style word inputs."""
    from regennet_tpu.data.humanml.word_vectorizer import WordVectorizer

    wv = WordVectorizer(glove_root, "our_vab")
    max_len = 20
    word_embs, pos_ohots, lens = [], [], []
    for text in prompts:
        tokens = [f"{w}/OTHER" for w in text.split()][:max_len]
        tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
        embs, poss = [], []
        for tok in tokens:
            e, pos = wv[tok]
            embs.append(e)
            poss.append(pos)
        lens.append(len(tokens))
        pad = (max_len + 2) - len(tokens)
        embs += [np.zeros_like(embs[0])] * pad
        poss += [np.zeros_like(poss[0])] * pad
        word_embs.append(np.stack(embs))
        pos_ohots.append(np.stack(poss))
    return (np.stack(word_embs).astype(np.float32),
            np.stack(pos_ohots).astype(np.float32),
            np.asarray(lens, np.int64))


def main(args=None):
    import jax
    import jax.numpy as jnp

    from regennet_tpu.data.humanml.motion_process import recover_from_ric
    from regennet_tpu.train import checkpoint
    from regennet_tpu.utils.fixseed import fixseed

    if args is None:
        args = parse_args()
    fixseed(args.seed)
    prompts = _prompts(args)
    B = len(prompts)

    # only the normalisation stats are needed — don't load the whole dataset
    mean = np.load(os.path.join(args.data_path, "Mean.npy"))
    std = np.load(os.path.join(args.data_path, "Std.npy"))
    dim_pose = int(mean.shape[0])
    joints_num = 22 if args.dataset == "humanml" else 21
    fps = 20 if args.dataset == "humanml" else 12.5  # KIT runs at 12.5 fps
    T_max = 196
    T = min(int(args.motion_length * fps), T_max)

    if args.model_path.endswith(".tar"):
        from regennet_tpu.convert.torch_ckpt import convert_comp_v6_checkpoint

        state = convert_comp_v6_checkpoint(args.model_path)
    else:
        state = checkpoint.load_checkpoint(args.model_path)

    rng = jax.random.PRNGKey(args.seed)
    if "movement_enc" in state:
        # comp_v6 route: prior sampling over word inputs (generator rebuild
        # shared with the eval route, incl. unit_length from args.json)
        from regennet_tpu.eval.eval_humanml import rebuild_comp_v6_generator

        gen, mov_enc, unit = rebuild_comp_v6_generator(
            args.model_path, dim_pose=dim_pose
        )
        T = (T // unit) * unit
        word_embs, pos_ohots, cap_lens = _word_inputs(
            prompts, args.glove_root
        )
        mov_in0 = mov_enc.apply(
            {"params": state["movement_enc"]},
            jnp.zeros((B, unit, dim_pose - 4)),
        )[:, 0]
        out = gen.apply(
            {"params": state["params"]}, jnp.asarray(word_embs),
            jnp.asarray(pos_ohots), jnp.asarray(cap_lens),
            jnp.full((B,), T, jnp.int32), mov_in0, rng, T // unit,
            method=gen.generate,
        )
        features = np.asarray(out["fake_motions"])  # [B, T, F]
    else:
        # diffusion route: args.json rebuilds the CMDM, text conditioning
        # via CLIP-or-fallback embeddings, CFG per --guidance_param
        import json

        from argparse import Namespace

        from regennet_tpu.diffusion import sampling
        from regennet_tpu.models.clip_text import encode_text_or_fallback
        from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
        from regennet_tpu.utils.model_util import create_model_and_diffusion

        args_path = os.path.join(
            os.path.dirname(args.model_path.rstrip("/")), "args.json"
        )
        with open(args_path) as f:
            margs = Namespace(**json.load(f))

        class _D:
            num_actions = 1
            num_person = 1

        model, sched, cfg = create_model_and_diffusion(margs, _D())
        x0 = jnp.zeros((1, model.njoints, model.nfeats, T_max))
        cond0 = {"cmotion": x0, "text_emb": jnp.zeros((1, 512))}
        params = model.init(jax.random.PRNGKey(0), x0,
                            jnp.zeros((1,), jnp.int32), cond0)["params"]
        # reuse the already-loaded state (no second disk restore)
        params = jax.tree_util.tree_map(
            lambda tmpl, v: jnp.asarray(v), params, state["params"]
        )
        guidance = float(args.guidance_param)
        model_fn = (
            make_cfg_model_fn(model, params, guidance)
            if guidance != 1.0 else make_model_fn(model, params)
        )
        shape = (B, model.njoints, model.nfeats, T_max)
        cond = {
            "cmotion": jnp.zeros(shape, jnp.float32),
            "text_emb": jnp.asarray(encode_text_or_fallback(prompts)),
        }
        sample = jax.jit(
            lambda r, c: sampling.p_sample_loop(
                sched, cfg, model_fn, shape, r, c, clip_denoised=False
            )
        )(rng, cond)
        features = np.asarray(sample)[:, :, 0, :].transpose(0, 2, 1)[:, :T]

    # denormalise + recover joints
    denorm = features * std + mean
    joints = np.asarray(
        recover_from_ric(jnp.asarray(denorm, jnp.float32), joints_num)
    )  # [B, T, J, 3]

    lengths = np.full(B, joints.shape[1])
    if args.length_estimator:
        from regennet_tpu.eval.eval_humanml import load_length_estimator

        est, est_params = load_length_estimator(args.length_estimator)
        word_embs, pos_ohots, cap_lens = _word_inputs(
            prompts, args.glove_root
        )
        logits = est.apply(
            {"params": est_params}, jnp.asarray(word_embs),
            jnp.asarray(pos_ohots), jnp.asarray(cap_lens)
        )
        bins = jax.random.categorical(
            jax.random.fold_in(rng, 1), jnp.asarray(logits), axis=-1
        )
        unit = 4
        lengths = np.clip(
            np.asarray(bins) * unit, unit, joints.shape[1]
        ).astype(np.int64)
        print(f"estimated lengths: {lengths.tolist()}", flush=True)

    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.model_path.rstrip("/")) or ".",
        f"samples_seed{args.seed}",
    )
    os.makedirs(out_dir, exist_ok=True)
    result = {
        "motion": joints, "feature": denorm, "text": prompts,
        "lengths": lengths, "num_samples": B,
    }
    np.save(os.path.join(out_dir, "results.npy"), result, allow_pickle=True)
    with open(os.path.join(out_dir, "results.txt"), "w") as f:
        f.write("\n".join(prompts))
    print(f"wrote {os.path.join(out_dir, 'results.npy')}", flush=True)

    if args.render:
        from regennet_tpu.data.humanml.motion_process import (
            KIT_KINEMATIC_CHAIN,
            T2M_KINEMATIC_CHAIN,
        )
        from regennet_tpu.render.plot_script import plot_3d_motion

        chain = (T2M_KINEMATIC_CHAIN if args.dataset == "humanml"
                 else KIT_KINEMATIC_CHAIN)
        for i, text in enumerate(prompts):
            path = plot_3d_motion(
                os.path.join(out_dir, f"sample{i:02d}.mp4"), chain,
                joints[i, : int(lengths[i])], title=text,
                dataset=args.dataset, fps=int(fps),
            )
            print(f"rendered {path}", flush=True)
    return result


if __name__ == "__main__":
    main()

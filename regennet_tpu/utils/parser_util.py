"""CLI argument system with checkpoint-args round-trip.

Mirrors the reference parser groups and the args.json override contract
(reference: utils/parser_util.py:7-295): training serialises the dataset /
model / diffusion argument groups next to the checkpoint; sampling and
evaluation CLIs reload them from there, force-overwriting CLI values.
"""

from __future__ import annotations

import argparse
import json
import os
from argparse import ArgumentParser


def parse_and_load_from_model(parser, with_data: bool = True,
                              tar_ok: bool = False):
    if with_data:
        add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    args = parser.parse_args()
    groups = (["dataset"] if with_data else []) + ["model", "diffusion"]
    args_to_overwrite = []
    for group_name in groups:
        args_to_overwrite += get_args_per_group_name(parser, args, group_name)

    model_path = get_model_path_from_args()
    if tar_ok and model_path.endswith(".tar"):
        # released torch checkpoint (t2m comp_v6 tar, eval route only) — no
        # args.json contract exists for these; the consuming route derives
        # its architecture from the checkpoint itself. Other CLIs keep the
        # hard args.json requirement so a mistyped path fails fast.
        if args.cond_mask_prob == 0:
            args.guidance_param = 1
        return args
    args_path = os.path.join(os.path.dirname(model_path), "args.json")
    assert os.path.exists(args_path), "Arguments json file was not found!"
    with open(args_path, "r") as fr:
        model_args = json.load(fr)

    for a in args_to_overwrite:
        if a in model_args:
            setattr(args, a, model_args[a])
        elif "cond_mode" in model_args:  # backward compatibility
            setattr(args, "unconstrained", model_args["cond_mode"] == "no_cond")
        else:
            print(
                f"Warning: was not able to load [{a}], "
                f"using default value [{args.__dict__[a]}] instead."
            )
    if args.cond_mask_prob == 0:
        args.guidance_param = 1
    return args


def parse_and_load_from_model_wo_data(parser):
    return parse_and_load_from_model(parser, with_data=False)


def get_args_per_group_name(parser, args, group_name):
    for group in parser._action_groups:
        if group.title == group_name:
            group_dict = {
                a.dest: getattr(args, a.dest, None) for a in group._group_actions
            }
            return list(argparse.Namespace(**group_dict).__dict__.keys())
    return ValueError("group_name was not found.")


def get_model_path_from_args():
    try:
        dummy_parser = ArgumentParser()
        dummy_parser.add_argument("model_path")
        dummy_args, _ = dummy_parser.parse_known_args()
        return dummy_args.model_path
    except Exception:
        raise ValueError("model_path argument must be specified.")


def save_args(args, save_dir: str):
    """Serialise args to {save_dir}/args.json (training side of the contract)."""
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)


def add_base_options(parser):
    group = parser.add_argument_group("base")
    group.add_argument("--cuda", default=True, type=bool,
                       help="Unused on TPU; kept for CLI compatibility.")
    group.add_argument("--device", default=0, type=int, help="Device id.")
    group.add_argument("--seed", default=10, type=int, help="Random seed.")
    group.add_argument("--batch_size", default=64, type=int,
                       help="Batch size during training.")
    group.add_argument("--use_ddim", action="store_true",
                       help="Use DDIM to accelerate the inference or not.")
    group.add_argument("--timestep_respacing", default="", type=str,
                       help="ddim timestep respacing.")


def add_diffusion_options(parser):
    group = parser.add_argument_group("diffusion")
    group.add_argument("--noise_schedule", default="cosine",
                       choices=["linear", "cosine"], type=str)
    group.add_argument("--diffusion_steps", default=1000, type=int)
    group.add_argument("--sigma_small", default=True, type=bool)


def add_model_options(parser):
    group = parser.add_argument_group("model")
    group.add_argument("--setting", default="mdm", choices=["mdm", "cmdm"], type=str)
    group.add_argument("--arch", default="trans_enc",
                       choices=["trans_enc", "trans_dec", "gru", "mlp", "online",
                                "offline"], type=str)
    group.add_argument("--emb_trans_dec", default=False, type=bool)
    group.add_argument("--wo_pos_emb", action="store_true")
    group.add_argument("--cm_mode", default="concat",
                       choices=["add", "concat", "concat2"], type=str)
    group.add_argument("--layers", default=8, type=int)
    group.add_argument("--latent_dim", default=512, type=int)
    group.add_argument("--cond_mask_prob", default=0.1, type=float)
    group.add_argument("--lambda_rcxyz", default=0.0, type=float)
    group.add_argument("--lambda_vel", default=0.0, type=float)
    group.add_argument("--lambda_fc", default=0.0, type=float)
    group.add_argument("--lambda_orient", default=1.0, type=float)
    group.add_argument("--lambda_body", default=1.0, type=float)
    group.add_argument("--lambda_transl", default=1.0, type=float)
    group.add_argument("--unconstrained", action="store_true")


def add_data_options(parser):
    group = parser.add_argument_group("dataset")
    group.add_argument("--dataset", default="humanml",
                       choices=["humanml", "kit", "humanact12", "uestc", "ntu",
                                "chi3d", "gta", "sbu"], type=str)
    group.add_argument("--data_dir", default="", type=str)
    group.add_argument("--num_person", default=1, type=int)
    group.add_argument("--data_path", default="", type=str)
    group.add_argument("--pose_rep", default="rot6d", type=str)
    group.add_argument("--body_model", default="smpl",
                       choices=["smpl", "smplx"], type=str)
    group.add_argument("--vel_threshold", default=0.01, type=float)
    group.add_argument("--shuffle", action="store_true",
                       help="Shuffle actor-reactor order during training.")


def add_training_options(parser):
    group = parser.add_argument_group("training")
    group.add_argument("--save_dir", required=True, type=str)
    group.add_argument("--overwrite", action="store_true")
    group.add_argument("--train_platform_type", default="NoPlatform",
                       choices=["NoPlatform", "ClearmlPlatform",
                                "TensorboardPlatform"], type=str)
    group.add_argument("--lr", default=1e-4, type=float)
    group.add_argument("--weight_decay", default=0.0, type=float)
    group.add_argument("--lr_anneal_steps", default=0, type=int)
    group.add_argument("--ema_rate", default=0.9999, type=float,
                       help="EMA decay for the averaged parameters. The "
                            "reference hardcodes 0.9999 (reference: "
                            "train/training_loop.py:42); shorter runs want "
                            "a faster rate (e.g. 0.999 for ~10k steps).")
    group.add_argument("--eval_batch_size", default=32, type=int)
    group.add_argument("--eval_split", default="test", choices=["val", "test"])
    group.add_argument("--eval_during_training", action="store_true")
    group.add_argument("--rec_model_path", default="", type=str,
                       help="Recognition-classifier checkpoint for in-training eval.")
    group.add_argument("--nan_guard", action="store_true",
                       help="Drop non-finite training steps (loss or grad "
                            "norm) and roll back. Costs throughput: the host "
                            "syncs on every step (no async dispatch) and "
                            "state donation is disabled (~2x state memory).")
    group.add_argument("--eval_rep_times", default=3, type=int)
    group.add_argument("--eval_num_samples", default=1_000, type=int)
    group.add_argument("--log_interval", default=1_000, type=int)
    group.add_argument("--save_interval", default=10_000, type=int)
    group.add_argument("--num_steps", default=600_000, type=int)
    group.add_argument("--num_frames", default=60, type=int)
    group.add_argument("--profile_steps", default=0, type=int,
                       help="capture a jax.profiler trace for this many "
                       "steps (0 disables)")
    group.add_argument("--profile_start", default=10, type=int)
    group.add_argument("--resume_checkpoint", default="", type=str)
    group.add_argument("--data_parallel", default=-1, type=int,
                       help="Devices for data parallelism (-1: all).")
    group.add_argument("--tensor_parallel", default=1, type=int,
                       help="Devices for tensor parallelism within a replica.")
    group.add_argument("--param_sharding", default="replicated",
                       choices=["replicated", "fsdp"], type=str,
                       help="fsdp: ZeRO-style sharding of params, EMA and "
                            "AdamW moments over the data axis (GSPMD "
                            "all-gathers on use). Absent in the reference "
                            "(plain DDP); useful for large width sweeps.")
    group.add_argument("--compute_dtype", default="float32",
                       choices=["float32", "bfloat16"], type=str)
    group.add_argument("--steps_per_call", default=8, type=int,
                       help="Fuse this many optimizer steps into one jitted "
                            "device call (lax.scan over a stacked batch "
                            "block). Amortises per-step dispatch latency "
                            "(+37%% measured on the flagship train config; "
                            "docs/PERF.md); saves/eval shift to the first "
                            "call boundary at-or-after their configured "
                            "step, --nan_guard rolls back whole blocks, and "
                            "with a loss-aware schedule sampler steps 2..K "
                            "of a block sample from an up-to-(K-1)-update "
                            "stale importance distribution. 1 restores the "
                            "reference's one-step-per-iteration behavior "
                            "(reference: train/training_loop.py:175-211).")


def add_sampling_options(parser):
    group = parser.add_argument_group("sampling")
    group.add_argument("--model_path", required=True, type=str)
    group.add_argument("--output_dir", default="", type=str)
    group.add_argument("--num_samples", default=10, type=int)
    group.add_argument("--num_repetitions", default=3, type=int)
    group.add_argument("--guidance_param", default=2.5, type=float)


def add_generate_options(parser):
    group = parser.add_argument_group("generate")
    group.add_argument("--motion_length", default=60, type=float)
    group.add_argument("--input_text", default="", type=str)
    group.add_argument("--action_file", default="", type=str)
    group.add_argument("--text_prompt", default="", type=str)
    group.add_argument("--action_name", default="", type=str)


def add_edit_options(parser):
    group = parser.add_argument_group("edit")
    group.add_argument("--edit_mode", default="in_between",
                       choices=["in_between", "upper_body"], type=str)
    group.add_argument("--text_condition", default="", type=str)
    group.add_argument("--prefix_end", default=0.25, type=float)
    group.add_argument("--suffix_start", default=0.75, type=float)


def add_evaluation_options(parser):
    group = parser.add_argument_group("eval")
    group.add_argument("--model_path", required=True, type=str)
    group.add_argument("--rec_model_path", required=True, type=str)
    group.add_argument("--eval_mode", default="debug", type=str)
    group.add_argument("--guidance_param", default=2.5, type=float)
    group.add_argument("--auto_regressive", action="store_true")
    group.add_argument(
        "--unconstrained_rec_path", default="", type=str,
        help="shallow unconstrained-eval ST-GCN classifier (released "
        "humanact12_gru_modi_struct.pth.tar or an orbax dir); with "
        "--unconstrained_data_path enables the reference's single-shot "
        "unconstrained FID/KID/diversity protocol "
        "(reference: eval/unconstrained/evaluate.py:59).",
    )
    group.add_argument(
        "--unconstrained_data_path", default="", type=str,
        help="humanact12_modi_struct.npy dataset motions for the "
        "unconstrained protocol (reference: "
        "eval/unconstrained/evaluate.py:60).",
    )
    group.add_argument(
        "--length_estimator", default="", type=str,
        help="trained MotionLenEstimatorBiGRU checkpoint (orbax dir or "
        "released length_est_bigru latest.tar); the comp_v6 eval route "
        "samples per-prompt motion lengths from it (published protocol). "
        "Empty = evaluate at ground-truth lengths.",
    )
    group.add_argument(
        "--eval_seed_batch", default=0, type=int,
        help="stack this many eval seeds into one sampling batch "
        "(0 = auto: 128 // batch_size; 1 disables)",
    )


def train_args():
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    add_training_options(parser)
    return parser.parse_args()


def generate_args():
    parser = ArgumentParser()
    add_base_options(parser)
    add_sampling_options(parser)
    add_generate_options(parser)
    return parse_and_load_from_model(parser)


def cgenerate_args():
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_sampling_options(parser)
    add_generate_options(parser)
    return parse_and_load_from_model_wo_data(parser)


def edit_args():
    parser = ArgumentParser()
    add_base_options(parser)
    add_sampling_options(parser)
    add_edit_options(parser)
    return parse_and_load_from_model(parser)


def evaluation_parser():
    parser = ArgumentParser()
    add_base_options(parser)
    add_evaluation_options(parser)
    # the eval route accepts released comp_v6 .tar checkpoints (no args.json)
    return parse_and_load_from_model(parser, tar_ok=True)

"""Legacy single-person evaluation CLI (reference:
eval/eval_humanact12_uestc.py): HumanAct12 via the GRU (action2motion)
evaluator, UESTC via the single-person ST-GCN evaluator. Also callable
in-training (TrainLoop.evaluate hook parity)."""

from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp

from regennet_tpu.data.get_data import get_dataset
from regennet_tpu.eval.tools import save_metrics
from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
from regennet_tpu.train import checkpoint
from regennet_tpu.utils import parser_util
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.model_util import create_model_and_diffusion


def evaluate(args, model_fn_builder, sched, cfg, data, rec_model_path):
    if args.dataset == "humanact12":
        from regennet_tpu.eval import gru_eval
        from regennet_tpu.models.gru_classifier import MotionDiscriminator

        disc = MotionDiscriminator(output_size=12)
        m0 = jnp.zeros((1, 24, 3, args.num_frames))
        variables = disc.init(jax.random.PRNGKey(0), m0, jnp.asarray([1]))
        if rec_model_path and rec_model_path.endswith((".tar", ".pt", ".pth")):
            # released torch classifier (humanact12_gru.tar; reference:
            # eval/a2m/action2motion/models.py:67-73)
            from regennet_tpu.convert.torch_ckpt import (
                convert_gru_classifier,
                load_torch_state_dict,
            )

            variables = convert_gru_classifier(
                load_torch_state_dict(rec_model_path)
            )
        elif rec_model_path and rec_model_path != "random":
            variables = checkpoint.load_checkpoint(rec_model_path, dict(variables))
        evaluator = gru_eval.A2MEvaluator(12, dict(variables))
        return gru_eval.evaluate(
            args, model_fn_builder, sched, cfg, data, evaluator,
            unconstrained=getattr(args, "unconstrained", False),
        )
    if args.dataset == "uestc":
        from regennet_tpu.eval import stgcn_eval
        from regennet_tpu.eval.eval_cmdm import load_stgcn_evaluator

        args.body_model = "smpl"
        evaluator_args = args
        evaluator = _load_uestc_evaluator(evaluator_args, rec_model_path)
        return stgcn_eval.evaluate(
            args, model_fn_builder, sched, cfg, data, evaluator,
            setting="mdm", acc_only=(args.eval_mode == "debug"),
        )
    raise NotImplementedError("This dataset is not supported.")


def _load_uestc_evaluator(args, rec_model_path):
    from regennet_tpu.eval.stgcn_eval import STGCNEvaluator
    from regennet_tpu.models.stgcn import STGCN

    model = STGCN(
        in_channels=6, num_class=40, num_person=1, layout="smpl",
        strategy="spatial", edge_importance_weighting=True,
    )
    dummy = {"output": jnp.zeros((1, 25, 6, args.num_frames))}
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if rec_model_path and rec_model_path != "random":
        variables = checkpoint.load_checkpoint(rec_model_path, dict(variables))
    return STGCNEvaluator(
        "uestc", "smpl", num_classes=40, nfeats=6, num_person=1,
        variables=dict(variables),
    )


def main(args=None):
    if args is None:
        args = parser_util.evaluation_parser()
    fixseed(args.seed)

    print(f"Eval mode [{args.eval_mode}]")
    assert args.eval_mode in ("debug", "full")
    if args.eval_mode == "debug":
        args.num_samples = 10
        args.num_seeds = 2
    else:
        args.num_samples = 1000
        args.num_seeds = 20

    if not getattr(args, "num_frames", None) or args.num_frames <= 0:
        args.num_frames = 60

    data = get_dataset(
        name=args.dataset, num_frames=args.num_frames, num_person=1,
        data_path=args.data_path, split="train", setting="mdm",
        pose_rep=args.pose_rep, body_model="smpl",
    )
    args.num_actions = data.num_actions
    args.setting = "mdm"
    model, sched, cfg = create_model_and_diffusion(args, data)

    x = jnp.zeros((1, model.njoints, model.nfeats, args.num_frames))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(args.seed), x,
                        jnp.zeros((1,), jnp.int32), cond)["params"]
    if args.model_path and args.model_path != "random":
        params = checkpoint.load_checkpoint(
            args.model_path, {"params": params}
        )["params"]

    guidance = float(getattr(args, "guidance_param", 1.0))

    def model_fn_builder():
        if guidance != 1.0:
            return make_cfg_model_fn(model, params, guidance)
        return make_model_fn(model, params)

    eval_results = evaluate(
        args, model_fn_builder, sched, cfg, data, args.rec_model_path
    )

    folder, ckpt_name = os.path.split(args.model_path)
    niter = (re.findall(r"\d+", ckpt_name) or ["0"])[0]
    scale_str = str(guidance).replace(".", "p")
    metricname = (
        f"evaluation_results_iter{niter}_samp{args.num_samples}"
        f"_scale{scale_str}_a2m.yaml"
    )
    evalpath = os.path.join(folder, metricname)
    print(f"Saving evaluation: {evalpath}")
    save_metrics(evalpath, eval_results)
    return eval_results


if __name__ == "__main__":
    main()

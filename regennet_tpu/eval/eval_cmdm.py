"""Evaluation CLI — `python -m regennet_tpu.eval.eval_cmdm`.

Capability parity with the reference (reference: eval/eval_cmdm.py:17-84):
modes `debug` (100 samples, 1 seed, accuracy-only) and `full` (1000 samples,
20 seeds, all metrics); results written to
`evaluation_results_<name>_<mode>_<niter>.yaml` beside the checkpoint and
tabulated with easy_table.
"""

from __future__ import annotations

import os

from regennet_tpu.data.get_data import get_dataset
from regennet_tpu.eval import stgcn_eval
from regennet_tpu.eval.tools import save_metrics
from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
from regennet_tpu.train import checkpoint
from regennet_tpu.utils import parser_util
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.model_util import create_model_and_diffusion


def load_stgcn_evaluator(args, rec_model_path: str):
    """Load the frozen recognition classifier (Orbax dir or converted torch
    state; see eval/convert_stgcn.py for .pth.tar conversion)."""
    import jax
    import jax.numpy as jnp

    from regennet_tpu.eval.stgcn_eval import STGCNEvaluator
    from regennet_tpu.models.stgcn import STGCN

    num_classes = {"ntu": 26, "chi3d": 8}[args.dataset]
    nfeats = 6 * 2  # both persons

    model = STGCN(
        in_channels=nfeats, num_class=num_classes, num_person=2,
        layout=args.body_model, strategy="spatial",
        edge_importance_weighting=True,
    )
    T = {"ntu": 60, "chi3d": 150}[args.dataset]
    dummy = {"output": jnp.zeros((1, {"smpl": 25, "smplx": 56}[args.body_model],
                                  nfeats, T))}
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
    if rec_model_path and rec_model_path != "random":
        variables = checkpoint.load_checkpoint(rec_model_path, dict(variables))
    return STGCNEvaluator(
        args.dataset, args.body_model, num_classes, nfeats, 2, dict(variables)
    )


def evaluate(args, model_fn_builder, sched, cfg, data, evaluator,
             auto_regressive=False, oracle=False):
    acc_only = args.eval_mode == "debug"
    return stgcn_eval.evaluate(
        args, model_fn_builder, sched, cfg, data, evaluator,
        setting=args.setting, acc_only=acc_only, auto_regressive=auto_regressive,
        oracle=oracle,
    )


def main(args=None):
    if args is None:
        args = parser_util.evaluation_parser()
    fixseed(args.seed)

    args.batch_size = 32  # eval protocol fixed batch (reference: :50)
    name = os.path.basename(os.path.dirname(args.model_path))
    niter = os.path.basename(args.model_path).replace("model", "").replace(".pt", "")
    log_file = os.path.join(
        os.path.dirname(args.model_path),
        f"evaluation_results_{name}_{args.eval_mode}_{niter}.yaml",
    )

    print(f"Eval mode [{args.eval_mode}]")
    if args.eval_mode == "debug":
        args.num_samples = 100
        args.num_seeds = 1
    elif args.eval_mode == "full":
        args.num_samples = 1000
        args.num_seeds = 20
    else:
        raise ValueError(f"unknown eval mode {args.eval_mode}")

    if not getattr(args, "num_frames", None) or args.num_frames <= 0:
        args.num_frames = {"ntu": 60, "chi3d": 150}.get(args.dataset, 60)

    data = get_dataset(
        name=args.dataset, num_frames=args.num_frames, num_person=args.num_person,
        data_path=args.data_path, split="test", setting=args.setting,
        pose_rep=args.pose_rep, body_model=args.body_model,
    )
    args.num_actions = data.num_actions

    model, sched, cfg = create_model_and_diffusion(args, data)

    # init/restore the denoiser
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, model.njoints, model.nfeats, args.num_frames))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    params = model.init(jax.random.PRNGKey(args.seed), x,
                        jnp.zeros((1,), jnp.int32), cond)["params"]
    if args.model_path and args.model_path != "random":
        restored = checkpoint.load_checkpoint(args.model_path, {"params": params})
        params = restored["params"]

    guidance = float(getattr(args, "guidance_param", 1.0))

    def model_fn_builder():
        if guidance != 1.0:
            return make_cfg_model_fn(model, params, guidance)
        return make_model_fn(model, params)

    evaluator = load_stgcn_evaluator(args, args.rec_model_path)

    eval_dict = evaluate(
        args, model_fn_builder, sched, cfg, data, evaluator,
        auto_regressive=getattr(args, "auto_regressive", False),
    )
    print(eval_dict)
    save_metrics(log_file, eval_dict)
    print(f"saved evaluation results to [{log_file}]")
    return eval_dict


if __name__ == "__main__":
    main()

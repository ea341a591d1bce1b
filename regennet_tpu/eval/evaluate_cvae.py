"""ACTOR CVAE/CAE baseline evaluation —
`python -m regennet_tpu.eval.evaluate_cvae`.

Capability parity with the vendored ACTOR evaluation entry point
(reference: actor-x/src/evaluate/evaluate_cvae.py:4-42 dataset dispatch +
stgcn_eval.py NewDataloader protocol): per seed, reshuffle the data, build
GT batches (pass-through) and generated batches (`model.generate` with the
batch's classes and durations), extract frozen ST-GCN features, and compute
accuracy / FID / diversity / multimodality on train and test splits.

`--other_metrics` adds the output-space metrics module (reference:
actor-x/src/evaluate/othermetrics/evaluation.py): mean acceleration,
reconstruction loss, and output-space diversity/multimodality.
"""

from __future__ import annotations

import argparse
import copy
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import collate
from regennet_tpu.data.get_data import BatchLoader, get_dataset
from regennet_tpu.eval import othermetrics
from regennet_tpu.eval.stgcn_eval import (
    STGCNEvaluator,
    build_gt_batches,
    evaluate_seed_metrics,
)
from regennet_tpu.eval.tools import save_metrics
from regennet_tpu.models.actor_cvae import ActorCVAE
from regennet_tpu.models.stgcn import STGCN
from regennet_tpu.train import checkpoint
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.rng import sampling_key

# reference: actor-x/src/evaluate/evaluate_cvae.py:9-35 dataset dispatch
# (humanact12/ntu13 route to the GRU action2motion evaluator there; the
# rest to the ST-GCN harness)
DATASET_EVAL = {
    "ntu": {"num_classes": 26, "num_person": 2, "harness": "stgcn"},
    "chi3d": {"num_classes": 8, "num_person": 2, "harness": "stgcn"},
    "uestc": {"num_classes": 40, "num_person": 1, "harness": "stgcn"},
    "humanact12": {"num_classes": 12, "num_person": 1, "harness": "gru"},
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, type=str)
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--dataset", default="chi3d", type=str)
    p.add_argument("--rec_model_path", default="random", type=str,
                   help="frozen ST-GCN recognition checkpoint")
    p.add_argument("--eval_mode", default="debug", type=str,
                   choices=["debug", "full"])
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_frames", default=0, type=int)
    p.add_argument("--other_metrics", action="store_true")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def _load_model(args):
    args_path = os.path.join(os.path.dirname(args.model_path.rstrip("/")),
                             "args.json")
    train_args = {}
    if os.path.exists(args_path):
        with open(args_path) as f:
            train_args = json.load(f)
    body_model = train_args.get("body_model", "smplx")
    num_person = int(train_args.get(
        "num_person", DATASET_EVAL[args.dataset]["num_person"]
    ))
    njoints = {"smpl": 25, "smplx": 56}[body_model]
    num_actions = int(train_args.get(
        "num_actions", DATASET_EVAL[args.dataset]["num_classes"]
    ))
    num_frames = args.num_frames or int(train_args.get("num_frames", 60))
    model = ActorCVAE(
        njoints=njoints, nfeats=6 * num_person, num_actions=num_actions,
        latent_dim=int(train_args.get("latent_dim", 256)),
        num_layers=int(train_args.get("num_layers", 4)),
        arch=train_args.get("arch", "transformer"),
        num_frames=num_frames,
        vae=train_args.get("modeltype", "cvae") == "cvae",
    )
    state = checkpoint.load_checkpoint(args.model_path)
    params = state["params"] if "params" in state else state
    return model, params, train_args, body_model, num_person, num_frames


def build_cvae_gen_batches(model, params, rng, loader, num_frames: int):
    """NewDataloader 'gen' mode for the CVAE (reference:
    actor-x/src/evaluate/stgcn_eval.py:48-77): one latent draw per item,
    decoded at the window length, conditioned on the batch's labels."""

    if model.dec_arch == "autotrans":
        def gen(z, action):
            return model.generate_autoregressive(
                {"params": params}, z, action, num_frames
            )
    else:
        @jax.jit
        def gen(z, action):
            return model.apply(
                {"params": params}, z, action, num_frames, method=model.decode
            )

    batches = []
    for motions, model_kwargs in loader:
        y = model_kwargs["y"]
        action = jnp.asarray(np.asarray(y["action"])[:, 0])
        rng, zrng = jax.random.split(rng)
        z = jax.random.normal(
            zrng, (action.shape[0], model.latent_dim), jnp.float32
        )
        out = np.asarray(gen(z, action))
        batches.append(
            {
                "output": out,
                "x": np.asarray(motions),
                "mask": np.asarray(y["mask"])[:, 0, 0, :].astype(bool),
                "lengths": np.asarray(y["lengths"]),
                "y": np.asarray(y["action"])[:, 0],
            }
        )
    return batches


def _evaluate_gru(args, model, params, train_args, num_frames, spec,
                  num_seeds):
    """Single-person GRU (action2motion) route for humanact12 (reference:
    actor-x/src/evaluate/evaluate_cvae.py:10-11 -> gru_eval.evaluate): per
    seed, decode gen/gt motions to SMPL joints and compute
    accuracy/FID/diversity/multimodality from GRU-classifier features."""
    from regennet_tpu.eval import metrics as M
    from regennet_tpu.eval.gru_eval import A2MEvaluator
    from regennet_tpu.ops import body_model as bm
    from regennet_tpu.ops.pose_decode import make_rot2xyz

    data = get_dataset(
        name=args.dataset, num_frames=num_frames, num_person=1,
        data_path=args.data_path, split="test", setting="mdm",
        pose_rep=train_args.get("pose_rep", "rot6d"), body_model="smpl",
    )
    body = bm.get_body_model("smpl")
    rot2xyz = make_rot2xyz(body, pose_rep="rot6d", jointstype="smpl",
                           translation=True, glob=True, vertstrans=True)
    a2m = A2MEvaluator(spec["num_classes"], None)
    variables = a2m.model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 3, num_frames)), jnp.asarray([num_frames]),
    )
    if args.rec_model_path and args.rec_model_path != "random":
        variables = checkpoint.load_checkpoint(args.rec_model_path,
                                               dict(variables))
    a2m.variables = dict(variables)

    batch_size = max(1, min(args.batch_size, len(data)))
    metrics_by_seed = {}
    for index, seed in enumerate(range(num_seeds)):
        print(f"Evaluation number: {index + 1}/{num_seeds}", flush=True)
        fixseed(seed)
        rng = sampling_key(seed)
        ds = copy.deepcopy(data)
        ds.reset_shuffle()
        ds.shuffle()
        loader = BatchLoader(ds, batch_size, collate, shuffle=False,
                             drop_last=True)
        rng, grng = jax.random.split(rng)
        gen = build_cvae_gen_batches(model, params, grng, loader, num_frames)
        gt = build_gt_batches(
            BatchLoader(ds, batch_size, collate, shuffle=False,
                        drop_last=True), -1,
        )

        def feats_of(batches):
            fs, ls, lg = [], [], []
            for b in batches:
                xyz = np.asarray(rot2xyz(jnp.asarray(b["output"])))
                out = a2m(xyz[:, :24], b["lengths"])
                fs.append(out["features"])
                lg.append(out["yhat"])
                ls.append(b["y"])
            return (np.concatenate(fs), np.concatenate(ls),
                    np.concatenate(lg))

        metrics = {}
        computed = {}
        for key, batches in [("gen", gen), ("gt", gt)]:
            f, l, g = feats_of(batches)
            metrics[f"accuracy_{key}"], _ = M.calculate_accuracy(
                g, l, spec["num_classes"]
            )
            div, mult = M.calculate_diversity_multimodality(
                f, l, spec["num_classes"], seed=seed
            )
            metrics[f"diversity_{key}"] = div
            metrics[f"multimodality_{key}"] = mult
            computed[key] = M.calculate_activation_statistics(f)
        for key in ("gen", "gt"):
            metrics[f"fid_{key}"] = float(
                M.calculate_fid(computed["gt"], computed[key])
            )
        metrics_by_seed[seed] = metrics
    return {
        "feats": {
            key: ["{:.6}".format(metrics_by_seed[s][key])
                  for s in range(num_seeds)]
            for key in metrics_by_seed[0]
        }
    }


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    if args.dataset not in DATASET_EVAL:
        raise NotImplementedError(
            f"dataset {args.dataset} is not supported by the CVAE evaluator "
            f"(reference dispatch: {sorted(DATASET_EVAL)})"
        )
    spec = DATASET_EVAL[args.dataset]
    model, params, train_args, body_model, num_person, num_frames = (
        _load_model(args)
    )

    num_seeds = 1 if args.eval_mode == "debug" else 20

    if spec["harness"] == "gru":
        metrics = _evaluate_gru(args, model, params, train_args, num_frames,
                                spec, num_seeds)
        name = os.path.basename(os.path.dirname(args.model_path.rstrip("/")))
        niter = checkpoint.parse_step_from_path(args.model_path)
        log_file = os.path.join(
            os.path.dirname(args.model_path.rstrip("/")),
            f"evaluation_results_{name}_{args.eval_mode}_{niter}.yaml",
        )
        save_metrics(log_file, metrics)
        print(f"wrote {log_file}", flush=True)
        return metrics

    data = get_dataset(
        name=args.dataset, num_frames=num_frames, num_person=num_person,
        data_path=args.data_path, split="test", setting="mdm",
        pose_rep=train_args.get("pose_rep", "rot6d"), body_model=body_model,
    )

    nfeats = 6 * num_person
    stgcn = STGCN(
        in_channels=nfeats, num_class=spec["num_classes"],
        num_person=num_person, layout=body_model, strategy="spatial",
        edge_importance_weighting=True,
    )
    dummy = {"output": jnp.zeros(
        (1, {"smpl": 25, "smplx": 56}[body_model], nfeats, num_frames)
    )}
    variables = stgcn.init(jax.random.PRNGKey(0), dummy, train=False)
    if args.rec_model_path and args.rec_model_path != "random":
        variables = checkpoint.load_checkpoint(
            args.rec_model_path, dict(variables)
        )
    evaluator = STGCNEvaluator(
        args.dataset, body_model, spec["num_classes"], nfeats, num_person,
        dict(variables),
    )

    data_types = ["train", "test"]
    datasetGT = {k: copy.deepcopy(data) for k in data_types}
    for k in data_types:
        datasetGT[k].split = k
    batch_size = max(1, min(args.batch_size,
                            min(len(datasetGT[k]) for k in data_types)))

    metrics_by_seed = {}
    other_by_seed = {}
    for index, seed in enumerate(range(num_seeds)):
        print(f"Evaluation number: {index + 1}/{num_seeds}", flush=True)
        fixseed(seed)
        rng = sampling_key(seed)
        loaders = {"gen": {}, "gt": {}}
        gen_full = {}
        for key in data_types:
            ds = datasetGT[key]
            ds.reset_shuffle()
            ds.shuffle()
            gt_iter = BatchLoader(ds, batch_size, collate,
                                  shuffle=False, drop_last=True)
            gen_iter = BatchLoader(ds, batch_size, collate,
                                   shuffle=False, drop_last=True)
            loaders["gt"][key] = build_gt_batches(gt_iter, -1)
            rng, grng = jax.random.split(rng)
            gen_full[key] = build_cvae_gen_batches(
                model, params, grng, gen_iter, num_frames
            )
            loaders["gen"][key] = gen_full[key]
        metrics_by_seed[seed] = evaluate_seed_metrics(
            evaluator, loaders, acc_only=False, seed=seed
        )
        if args.other_metrics:
            other_by_seed[seed] = othermetrics.evaluate_othermetrics(
                gen_full["test"], num_classes=spec["num_classes"]
            )

    metrics = {
        "feats": {
            key: [
                "{:.6}".format(metrics_by_seed[s][key])
                for s in range(num_seeds)
            ]
            for key in metrics_by_seed[0]
        }
    }
    if args.other_metrics:
        metrics["other"] = {
            key: ["{:.6}".format(other_by_seed[s][key])
                  for s in range(num_seeds)]
            for key in other_by_seed[0]
        }

    name = os.path.basename(os.path.dirname(args.model_path.rstrip("/")))
    niter = checkpoint.parse_step_from_path(args.model_path)
    log_file = os.path.join(
        os.path.dirname(args.model_path.rstrip("/")),
        f"evaluation_results_{name}_{args.eval_mode}_{niter}.yaml",
    )
    save_metrics(log_file, metrics)
    print(f"wrote {log_file}", flush=True)
    return metrics


if __name__ == "__main__":
    main()

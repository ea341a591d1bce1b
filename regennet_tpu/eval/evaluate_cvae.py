"""ACTOR CVAE/CAE baseline evaluation —
`python -m regennet_tpu.eval.evaluate_cvae`.

Protocol parity with the vendored ACTOR evaluation entry point (reference:
actor-x/src/evaluate/evaluate_cvae.py:4-42 dataset dispatch). The ST-GCN
route replicates actor-x/src/evaluate/stgcn_eval.py:143-192 per seed:
fixseed, shuffle BOTH splits, gt loaders over train+test, then gen loaders
over a second pass of the same iterators (`model.generate` with the batch's
classes and durations), frozen ST-GCN features, and the ACTOR metric
assembly (accuracy / FID / diversity / multimodality with the all-label
quota + 1000-iteration bail diversity variant, stgcn/diversity.py:25-35).
The GRU route (humanact12) replicates gru_eval.py:49-136 — the num_frames=60
pin, gen/gt/gt2 loaders, and A2M metrics on the ambient numpy stream.

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
    p.add_argument("--num_seeds", default=0, type=int,
                   help="override the evaluation seed count (reference: "
                        "actor-x/src/parser/evaluation.py --niter, default "
                        "20; 0 = 1 for debug / 20 for full)")
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
    # prefer the data-derived layout the trainer records (mirrors the
    # reference opt.yaml's update_parameters njoints/nfeats)
    njoints = int(train_args.get(
        "njoints", {"smpl": 25, "smplx": 56}[body_model]
    ))
    nfeats = int(train_args.get("nfeats", 6 * num_person))
    num_actions = int(train_args.get(
        "num_actions", DATASET_EVAL[args.dataset]["num_classes"]
    ))
    num_frames = args.num_frames or int(train_args.get("num_frames", 60))
    if DATASET_EVAL[args.dataset]["harness"] == "gru" and not args.num_frames:
        # the action2motion protocol is pinned at 60 frames regardless of the
        # training length (reference: actor-x/src/evaluate/gru_eval.py:50-59
        # sets parameters["num_frames"] = 60 before building model + data)
        num_frames = 60
    model = ActorCVAE(
        njoints=njoints, nfeats=nfeats, num_actions=num_actions,
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
    # two independent GT copies: gt2 is the reference's gt-vs-gt sanity
    # baseline (actor-x/src/evaluate/gru_eval.py:84-113); `data` itself
    # serves as GT1 (it is not used again below)
    ds1 = data
    ds2 = copy.deepcopy(data)
    for index, seed in enumerate(range(num_seeds)):
        print(f"Evaluation number: {index + 1}/{num_seeds}", flush=True)
        fixseed(seed)
        rng = sampling_key(seed)
        # the reference's stream order: shuffle GT1, shuffle GT2, then gen
        # over GT1, gt over a second pass of GT1, gt2 over GT2; plain
        # DataLoader defaults (no drop_last)
        ds1.reset_shuffle()
        ds1.shuffle()
        ds2.reset_shuffle()
        ds2.shuffle()
        loader1 = BatchLoader(ds1, batch_size, collate, shuffle=False,
                              drop_last=False)
        loader2 = BatchLoader(ds2, batch_size, collate, shuffle=False,
                              drop_last=False)
        rng, grng = jax.random.split(rng)
        gen = build_cvae_gen_batches(model, params, grng, loader1, num_frames)
        gt = build_gt_batches(loader1, -1)
        gt2 = build_gt_batches(loader2, -1)

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

        # metric assembly in the reference's loader order, with the
        # diversity draws consuming the per-seed ambient numpy stream
        # (actor-x/src/evaluate/action2motion/evaluate.py:50-96)
        metrics = {}
        computed = {}
        for key, batches in [("gen", gen), ("gt", gt), ("gt2", gt2)]:
            f, l, g = feats_of(batches)
            metrics[f"accuracy_{key}"], _ = M.calculate_accuracy(
                g, l, spec["num_classes"]
            )
            # "a2m" = the actor-x action2motion variant: every label gets a
            # quota (nan + warning when one is absent — the reference hangs)
            div, mult = M.calculate_diversity_multimodality(
                f, l, spec["num_classes"], actor_quirks="a2m"
            )
            metrics[f"diversity_{key}"] = div
            metrics[f"multimodality_{key}"] = mult
            computed[key] = M.calculate_activation_statistics(f)
        for key in ("gen", "gt", "gt2"):
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

    num_seeds = args.num_seeds or (1 if args.eval_mode == "debug" else 20)

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
        # the reference's per-seed stream order (actor-x/src/evaluate/
        # stgcn_eval.py:143-176): shuffle BOTH splits first, then gt over
        # train and test, then gen over a second pass of the same loaders
        # (fresh window draws); plain DataLoader defaults (no drop_last)
        loaders_by_key = {}
        for key in data_types:
            ds = datasetGT[key]
            ds.reset_shuffle()
            ds.shuffle()
            loaders_by_key[key] = BatchLoader(ds, batch_size, collate,
                                              shuffle=False, drop_last=False)
        loaders = {"gen": {}, "gt": {}}
        gen_full = {}
        for key in data_types:
            loaders["gt"][key] = build_gt_batches(loaders_by_key[key], -1)
        for key in data_types:
            rng, grng = jax.random.split(rng)
            gen_full[key] = build_cvae_gen_batches(
                model, params, grng, loaders_by_key[key], num_frames
            )
            loaders["gen"][key] = gen_full[key]
        metrics_by_seed[seed] = evaluate_seed_metrics(
            evaluator, loaders, acc_only=False, seed=None, actor_quirks=True
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

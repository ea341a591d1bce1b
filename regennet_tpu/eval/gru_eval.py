"""Single-person a2m evaluation with the GRU classifier (HumanAct12).

Capability parity with the reference harness (reference: eval/a2m/gru_eval.py
+ eval/a2m/action2motion/evaluate.py): per seed, build generated, GT, and
second-GT (gt2 sanity baseline) loaders, decode xyz through the SMPL joint
set, extract GRU features, and compute accuracy / FID / diversity /
multimodality in the reference's exact stream order; unconstrained mode runs
the reference's single-shot shallow-ST-GCN protocol when the released
classifier + modi-struct dataset are supplied
(--unconstrained_rec_path/--unconstrained_data_path), and otherwise falls
back to FID/KID/precision-recall over the GRU evaluator's features.
"""

from __future__ import annotations

import copy
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import collate
from regennet_tpu.data.get_data import BatchLoader
from regennet_tpu.diffusion import sampling
from regennet_tpu.eval import metrics as M
from regennet_tpu.eval.unconstrained import evaluate_unconstrained_metrics
from regennet_tpu.models.gru_classifier import MotionDiscriminator
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.rng import sampling_key


class A2MEvaluator:
    """Frozen GRU classifier over SMPL joint trajectories."""

    def __init__(self, num_classes: int, variables, num_joints: int = 24):
        self.num_classes = num_classes
        self.model = MotionDiscriminator(
            input_size=num_joints * 3, output_size=num_classes
        )
        self.variables = variables
        self._apply = jax.jit(
            lambda v, m, l: self.model.apply(v, m, l)
        )

    def __call__(self, motion_xyz, lengths):
        out = self._apply(
            self.variables, jnp.asarray(motion_xyz), jnp.asarray(lengths)
        )
        return {
            "features": np.asarray(out["features"]),
            "yhat": np.asarray(out["yhat"]),
        }


def _build_batches(sample_fn, rng, loader, num_samples, mode, rot2xyz):
    batches = []
    for motions, model_kwargs in loader:
        if num_samples != -1 and len(batches) * loader.batch_size > num_samples:
            continue
        y = model_kwargs["y"]
        if mode == "gen":
            cond = {"mask": jnp.asarray(y["mask"])}
            if "action" in y:
                cond["action"] = jnp.asarray(y["action"])
            cond["cmotion"] = jnp.zeros_like(jnp.asarray(motions))
            rng, srng = jax.random.split(rng)
            output = np.asarray(sample_fn(srng, cond, motions.shape))
        else:
            output = np.asarray(motions)
        mask = np.asarray(y["mask"])[:, 0, 0].astype(bool)
        xyz = np.asarray(rot2xyz(jnp.asarray(output), jnp.asarray(mask)))
        batches.append(
            {
                "output": output,
                "output_xyz": xyz,
                "lengths": np.asarray(y["lengths"]),
                "y": np.asarray(y["action"])[:, 0],
            }
        )
    if batches and num_samples > 0:
        rem = num_samples % loader.batch_size
        if rem:
            for k, v in batches[-1].items():
                batches[-1][k] = v[:rem]
    return batches


def _features(evaluator, batches):
    feats, labels, logits = [], [], []
    for b in batches:
        out = evaluator(b["output_xyz"], b["lengths"])
        feats.append(out["features"])
        logits.append(out["yhat"])
        labels.append(b["y"])
    return (
        np.concatenate(feats), np.concatenate(labels), np.concatenate(logits)
    )


def evaluate(args, model_fn_builder, sched, cfg, data, evaluator: A2MEvaluator,
             unconstrained: bool = False) -> Dict:
    bs = args.batch_size
    body = bm.get_body_model("smpl")
    rot2xyz = make_rot2xyz(
        body, pose_rep="rot6d", jointstype="smpl", translation=True,
        glob=True, vertstrans=True,
    )
    model_fn = model_fn_builder()

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def sample_fn(rng, cond, shape):
        return sampling.p_sample_loop(
            sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
        )

    metrics_by_seed = {}
    # TWO independent GT dataset copies, as in the reference (gt2 gives the
    # gt-vs-gt sanity baseline; reference: eval/a2m/gru_eval.py:70-71)
    ds1 = copy.deepcopy(data)
    ds2 = copy.deepcopy(data)
    for index, seed in enumerate(range(args.num_seeds)):
        print(f"Evaluation number: {index + 1}/{args.num_seeds}")
        fixseed(seed)
        rng = sampling_key(seed)
        # the reference's python-random consumption order per seed
        # (gru_eval.py:79-97): shuffle GT1, shuffle GT2, then gen over GT1,
        # gt over a second pass of GT1 (fresh window draws), gt2 over GT2;
        # loaders do NOT drop the last partial batch here (plain DataLoader
        # defaults, unlike the stgcn harness)
        ds1.reset_shuffle()
        ds1.shuffle()
        ds2.reset_shuffle()
        ds2.shuffle()
        eff_bs = min(bs, len(ds1))
        if eff_bs == 0:
            raise ValueError("evaluation dataset is empty")
        loader1 = BatchLoader(
            ds1, eff_bs, collate, shuffle=False, drop_last=False
        )
        loader2 = BatchLoader(
            ds2, eff_bs, collate, shuffle=False, drop_last=False
        )
        rng, grng = jax.random.split(rng)
        gen = _build_batches(
            sample_fn, grng, loader1, args.num_samples, "gen", rot2xyz
        )
        gt = _build_batches(None, rng, loader1, args.num_samples, "gt",
                            rot2xyz)
        gt2 = _build_batches(None, rng, loader2, args.num_samples, "gt",
                             rot2xyz)

        # metric assembly in the reference's loader order (gen, gt, gt2):
        # accuracy -> features -> diversity per loader (the diversity draws
        # consume the ambient numpy stream seeded by fixseed), then FID of
        # every loader against the gt statistics
        # (eval/a2m/action2motion/evaluate.py:41-84). The reference skips
        # accuracy (nan) and multimodality (nan) for unconditioned models.
        metrics: Dict[str, float] = {}
        computed = {}
        for key, batches in [("gen", gen), ("gt", gt), ("gt2", gt2)]:
            feats, labels, logits = _features(evaluator, batches)
            if unconstrained:
                metrics[f"accuracy_{key}"] = float("nan")
            else:
                metrics[f"accuracy_{key}"], _ = M.calculate_accuracy(
                    logits, labels, evaluator.num_classes
                )
            computed[key] = {"feats": feats, "labels": labels}
            div, mult = M.calculate_diversity_multimodality(
                feats, labels, evaluator.num_classes,
                unconstrained=unconstrained,
            )
            metrics[f"diversity_{key}"] = div
            metrics[f"multimodality_{key}"] = mult
        gt_stats = M.calculate_activation_statistics(computed["gt"]["feats"])
        for key in computed:
            metrics[f"fid_{key}"] = float(M.calculate_fid(
                gt_stats,
                M.calculate_activation_statistics(computed[key]["feats"]),
            ))
        if unconstrained and not _unconstrained_assets_available(args):
            # no released shallow ST-GCN / modi-struct dataset: fall back to
            # unconstrained-style metrics over the GRU evaluator's features
            metrics.update(
                evaluate_unconstrained_metrics(
                    computed["gt"]["feats"], computed["gen"]["feats"],
                    seed=seed,
                )
            )
        metrics_by_seed[seed] = metrics

    result = {
        "feats": {
            key: [
                "{:.6}".format(metrics_by_seed[s][key])
                for s in range(args.num_seeds)
            ]
            for key in metrics_by_seed[0]
        }
    }

    if unconstrained:
        uncon = _reference_unconstrained_metrics(
            args, sample_fn, data, rot2xyz
        )
        if uncon is not None:
            # the reference merges these once-computed scalars straight into
            # the per-seed feats dict (reference: eval/a2m/gru_eval.py:128-129)
            result["feats"].update(
                {k: "{:.6}".format(v) for k, v in uncon.items()}
            )
    return result


def _unconstrained_assets_available(args) -> bool:
    import os

    rec_path = getattr(args, "unconstrained_rec_path", None)
    data_path = getattr(args, "unconstrained_data_path", None)
    return bool(rec_path and data_path and os.path.exists(rec_path)
                and os.path.exists(data_path))


def _reference_unconstrained_metrics(args, sample_fn, data, rot2xyz):
    """The reference's single-shot unconstrained protocol: sample 1000
    motions, select the 15 openpose joints, and score them with the shallow
    unconstrained ST-GCN against the modi-struct dataset array (reference:
    eval/a2m/gru_eval.py:106-121 with num_samples_unconstrained=1000,
    fast=True). Needs the released classifier
    (assets/actionrecognition/humanact12_gru_modi_struct.pth.tar) and
    dataset (dataset/HumanAct12Poses/humanact12_modi_struct.npy) — pass
    them as args.unconstrained_rec_path / args.unconstrained_data_path;
    returns None (protocol unavailable) when either is missing, leaving the
    per-seed evaluator-feature fallback metrics in place."""
    if not _unconstrained_assets_available(args):
        return None
    rec_path = args.unconstrained_rec_path
    data_path = args.unconstrained_data_path

    from regennet_tpu.eval.unconstrained import (
        SMPL_TO_OPENPOSE15,
        evaluate_unconstrained_reference_protocol,
    )
    from regennet_tpu.models.stgcn import make_unconstrained_stgcn

    if rec_path.endswith((".tar", ".pt", ".pth")):
        from regennet_tpu.convert.torch_ckpt import (
            convert_stgcn,
            load_torch_state_dict,
        )

        variables = convert_stgcn(load_torch_state_dict(rec_path))
    else:
        from regennet_tpu.train import checkpoint

        model = make_unconstrained_stgcn()
        template = model.init(
            jax.random.PRNGKey(0),
            {"output": jnp.zeros((1, 15, 3, args.num_frames))}, train=False,
        )
        variables = checkpoint.load_checkpoint(rec_path, dict(template))

    ds = copy.deepcopy(data)
    ds.reset_shuffle()
    ds.shuffle()
    eff_bs = min(args.batch_size, len(ds))
    loader = BatchLoader(ds, eff_bs, collate, shuffle=False, drop_last=True)
    num_samples = 1000  # reference: num_samples_unconstrained
    rng = sampling_key(getattr(args, "seed", 0) + 10_000)
    gen = _build_batches(sample_fn, rng, loader, num_samples, "gen", rot2xyz)
    gen_xyz = np.concatenate([b["output_xyz"][:, SMPL_TO_OPENPOSE15]
                              for b in gen])
    dataset_motions = np.load(data_path, allow_pickle=True)
    return evaluate_unconstrained_reference_protocol(
        variables, gen_xyz, dataset_motions, fast=True, seed=0
    )

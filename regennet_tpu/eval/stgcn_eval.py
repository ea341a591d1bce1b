"""ST-GCN evaluation harness for CMDM (reference: eval/a2m/stgcn_eval.py +
eval/a2m/stgcn/evaluate.py).

Per seed: reshuffle the data, build GT batches and generated batches (full
diffusion sampling per batch — one jitted scan reused across all batches and
seeds), concatenate actor‖reactor into the 2-person representation, run the
frozen ST-GCN, and compute accuracy / FID / diversity / multimodality for
train and test splits. Includes the auto-regressive online protocol (one
full sampling pass per revealed condition frame).
"""

from __future__ import annotations

import copy
import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import ccollate, collate
from regennet_tpu.data.get_data import BatchLoader
from regennet_tpu.diffusion import sampling
from regennet_tpu.eval import metrics as M
from regennet_tpu.models.stgcn import STGCN
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.utils.fixseed import fixseed


class STGCNEvaluator:
    """Frozen classifier wrapper (reference: eval/a2m/stgcn/evaluate.py)."""

    def __init__(self, dataname: str, body_model: str, num_classes: int,
                 nfeats: int, num_person: int, variables: Dict[str, Any]):
        self.num_classes = num_classes
        self.model = STGCN(
            in_channels=nfeats,
            num_class=num_classes,
            num_person=num_person,
            layout=body_model,
            strategy="spatial",
            edge_importance_weighting=True,
        )
        self.variables = variables  # {'params': ..., 'batch_stats': ...}
        self._apply = jax.jit(
            lambda variables, batch: self.model.apply(variables, batch)
        )

    def __call__(self, batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
        out = self._apply(self.variables, {"output": jnp.asarray(batch["output"])})
        return {
            "features": np.asarray(out["features"]),
            "yhat": np.asarray(out["yhat"]),
        }


def build_generated_batches(
    sample_fn,
    rng,
    dataiterator,
    num_samples: int,
    setting: str,
    auto_regressive: bool = False,
) -> List[Dict]:
    """The NewDataloader 'gen' mode: run full diffusion sampling per batch."""
    batches = []
    for motions, model_kwargs in dataiterator:
        if num_samples != -1 and len(batches) * dataiterator.batch_size > num_samples:
            continue  # keep consuming, like the reference
        y = model_kwargs["y"]
        cond = {
            "mask": jnp.asarray(y["mask"]),
            "cmotion": jnp.asarray(y["cmotion"]),
        }
        if "action" in y:
            cond["action"] = jnp.asarray(y["action"])
        rng, step_rng = jax.random.split(rng)
        if auto_regressive:
            # re-sample the whole sequence once per revealed condition frame
            T = y["cmotion"].shape[-1]
            cmotion_bak = np.asarray(y["cmotion"])
            revealed = np.zeros_like(cmotion_bak)
            V = cmotion_bak.shape[1]
            C = cmotion_bak.shape[2]
            output = np.zeros(
                (cmotion_bak.shape[0], V, C * 2 if setting == "cmdm" else C, T),
                dtype=np.float32,
            )
            for frame_idx in range(T):
                revealed[:, :, :, frame_idx] = cmotion_bak[:, :, :, frame_idx]
                cond_ar = dict(cond, cmotion=jnp.asarray(revealed))
                step_rng, srng = jax.random.split(step_rng)
                sample = np.asarray(sample_fn(srng, cond_ar, motions.shape))
                tmp = (
                    np.concatenate([revealed, sample], axis=2)
                    if setting == "cmdm" else sample
                )
                output[:, :, :, frame_idx] = tmp[:, :, :, frame_idx]
        else:
            sample = np.asarray(sample_fn(step_rng, cond, motions.shape))
            if setting == "cmdm":
                output = np.concatenate([np.asarray(y["cmotion"]), sample], axis=2)
            else:
                output = sample
        batch = {
            "output": output,
            "lengths": np.asarray(y["lengths"]),
            "y": np.asarray(y["action"])[:, 0],
            "text": y.get("action_text"),
        }
        batches.append(batch)
    _trim_last_batch(batches, num_samples, dataiterator.batch_size)
    return batches


def build_gt_batches(dataiterator, num_samples: int) -> List[Dict]:
    batches = []
    for motions, model_kwargs in dataiterator:
        if num_samples != -1 and len(batches) * dataiterator.batch_size > num_samples:
            continue
        y = model_kwargs["y"]
        batches.append(
            {
                "output": np.asarray(motions),
                "lengths": np.asarray(y["lengths"]),
                "y": np.asarray(y["action"])[:, 0],
            }
        )
    _trim_last_batch(batches, num_samples, dataiterator.batch_size)
    return batches


def _trim_last_batch(batches, num_samples, batch_size):
    if not batches or num_samples <= 0:
        return
    rem = num_samples % batch_size
    if rem > 0:
        for k, v in batches[-1].items():
            if v is not None and hasattr(v, "__getitem__"):
                batches[-1][k] = v[:rem]


def compute_features(evaluator: STGCNEvaluator, batches: List[Dict]):
    feats, labels, logits = [], [], []
    for batch in batches:
        out = evaluator(batch)
        feats.append(out["features"])
        logits.append(out["yhat"])
        labels.append(batch["y"])
    return (
        np.concatenate(feats, 0),
        np.concatenate(labels, 0),
        np.concatenate(logits, 0),
    )


def evaluate_seed_metrics(
    evaluator: STGCNEvaluator, loaders: Dict[str, Dict[str, List[Dict]]],
    acc_only: bool = False, seed: Optional[int] = None,
) -> Dict[str, float]:
    """accuracy/FID/diversity/multimodality for {gen, gt} x {train, test}."""
    metrics_all = {}
    for sets in ["train", "test"]:
        computed = {}
        metrics: Dict[str, float] = {}
        for key, loader_sets in loaders.items():
            batches = loader_sets[sets]
            feats, labels, logits = compute_features(evaluator, batches)
            acc, _ = M.calculate_accuracy(logits, labels, evaluator.num_classes)
            metrics[f"accuracy_{key}"] = acc
            if not acc_only:
                stats = M.calculate_activation_statistics(feats)
                computed[key] = {"feats": feats, "labels": labels, "stats": stats}
                div, mult = M.calculate_diversity_multimodality(
                    feats, labels, evaluator.num_classes, seed=seed
                )
                metrics[f"diversity_{key}"] = div
                metrics[f"multimodality_{key}"] = mult
        if not acc_only:
            gtstats = computed["gt"]["stats"]
            for key in computed:
                metrics[f"fid_{key}"] = float(
                    M.calculate_fid(gtstats, computed[key]["stats"])
                )
        metrics_all[sets] = metrics

    out = {}
    for sets in ["train", "test"]:
        for key, val in metrics_all[sets].items():
            out[f"{key}_{sets}"] = val
    return out


def evaluate(
    args,
    model_fn_builder,
    sched,
    cfg,
    data,
    evaluator: STGCNEvaluator,
    setting: str = "cmdm",
    acc_only: bool = False,
    auto_regressive: bool = False,
) -> Dict:
    """Multi-seed evaluation loop (reference: eval/a2m/stgcn_eval.py:120-205).

    `model_fn_builder()` returns the diffusion ModelFn (CFG already folded if
    requested). Sampling is one jitted scan, compiled once for the batch
    shape and reused across every batch, split, and seed — the reference
    re-launches 1000 Python-step loops per batch.
    """
    bs = args.batch_size
    model_fn = model_fn_builder()

    @functools.partial(jax.jit, static_argnums=(2,))
    def sample_fn(rng, cond, shape):
        return sampling.p_sample_loop(
            sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
        )

    data_types = ["train", "test"]
    datasetGT = {k: copy.deepcopy(data) for k in data_types}
    for k in data_types:
        datasetGT[k].split = k

    stgcn_metrics = {}
    for index, seed in enumerate(range(args.num_seeds)):
        print(f"Evaluation number: {index + 1}/{args.num_seeds}")
        fixseed(seed)
        rng = jax.random.PRNGKey(seed)
        loaders: Dict[str, Dict[str, List[Dict]]] = {"gen": {}, "gt": {}}
        for key in data_types:
            ds = datasetGT[key]
            ds.reset_shuffle()
            ds.shuffle()
            gt_iter = BatchLoader(ds, bs, collate, shuffle=False, drop_last=True)
            gen_iter = BatchLoader(
                ds, bs, ccollate if setting == "cmdm" else collate,
                shuffle=False, drop_last=True,
            )
            loaders["gt"][key] = build_gt_batches(gt_iter, args.num_samples)
            rng, gen_rng = jax.random.split(rng)
            loaders["gen"][key] = build_generated_batches(
                sample_fn, gen_rng, gen_iter, args.num_samples, setting,
                auto_regressive,
            )
        stgcn_metrics[seed] = evaluate_seed_metrics(
            evaluator, loaders, acc_only=acc_only
        )
        del loaders

    metrics = {
        "feats": {
            key: [
                "{:.6}".format(stgcn_metrics[seed][key])
                for seed in range(args.num_seeds)
            ]
            for key in stgcn_metrics[0]
        }
    }
    return metrics

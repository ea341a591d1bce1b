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
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.rng import sampling_key


class STGCNEvaluator:
    """Frozen classifier wrapper (reference: eval/a2m/stgcn/evaluate.py)."""

    def __init__(self, dataname: str, body_model: str, num_classes: int,
                 nfeats: int, num_person: int, variables: Dict[str, Any],
                 channels=None, strides=None):
        """channels/strides override the 10-block default classifier size
        (reduced evaluators back the CPU-scale capability smoke; the
        protocol/parity paths always use the default)."""
        self.num_classes = num_classes
        size_kw = {}
        if channels is not None:
            size_kw = dict(channels=tuple(channels), strides=tuple(strides))
        self.model = STGCN(
            in_channels=nfeats,
            num_class=num_classes,
            num_person=num_person,
            layout=body_model,
            strategy="spatial",
            edge_importance_weighting=True,
            **size_kw,
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


def collect_gen_conds(dataiterator, num_samples: int,
                      keep_motion: bool = False) -> List[Dict]:
    """Materialise the host-side conditioning for every gen batch.

    Split out from sampling so the multi-seed path can stack several seeds'
    batches into one device call (the reference brute-forces 20 seeds
    sequentially at eval batch 32 — far below the chip's throughput-optimal
    batch; see SURVEY.md §7 'eval-cost control').

    keep_motion additionally stores the loader's (reactor) motion tensor —
    the oracle route substitutes it for the sampler output, bounding what a
    perfect model could score under this exact pipeline."""
    entries = []
    for motions, model_kwargs in dataiterator:
        if num_samples != -1 and len(entries) * dataiterator.batch_size > num_samples:
            continue  # keep consuming, like the reference
        y = model_kwargs["y"]
        cond = {"mask": np.asarray(y["mask"])}
        if "cmotion" in y:
            cond["cmotion"] = np.asarray(y["cmotion"])
        else:
            # mdm setting (single-person collate): the denoiser still takes
            # a cmotion input — zero condition, as in the gru_eval route
            cond["cmotion"] = np.zeros(
                np.asarray(motions).shape, dtype=np.float32
            )
        if "action" in y:
            cond["action"] = np.asarray(y["action"])
        entry = {
            "cond": cond,
            "shape": tuple(np.asarray(motions).shape),
            "lengths": np.asarray(y["lengths"]),
            "y": np.asarray(y["action"])[:, 0],
            "text": y.get("action_text"),
        }
        if keep_motion:
            entry["motion"] = np.asarray(motions)
        entries.append(entry)
    return entries


def _eval_mesh():
    """Data-parallel mesh for sampling when several devices are visible.

    The reference's eval is strictly single-GPU (SURVEY.md §3.3); here the
    (seed-stacked) sampling batch shards over a 1-axis mesh and GSPMD runs
    each shard's denoising locally — zero collectives in the sampler, so
    scaling is linear in chips. Disable with REGENNET_EVAL_MESH=0."""
    import os

    if os.environ.get("REGENNET_EVAL_MESH", "1") == "0":
        return None
    if len(jax.devices()) <= 1:
        return None
    from regennet_tpu.parallel import make_mesh

    return make_mesh(data=-1, model=1)


def _sample_output(sample_fn, rng, cond_np: Dict[str, np.ndarray], shape,
                   setting: str, auto_regressive: bool, mesh=None) -> np.ndarray:
    """Run diffusion sampling for one (possibly seed-stacked) batch."""
    cond = {k: jnp.asarray(v) for k, v in cond_np.items()}
    if mesh is not None and shape[0] % mesh.devices.size == 0:
        from regennet_tpu.parallel import shard_batch

        cond = shard_batch(cond, mesh)
    if not auto_regressive:
        sample = np.asarray(sample_fn(rng, cond, shape))
        if setting == "cmdm":
            return np.concatenate([cond_np["cmotion"], sample], axis=2)
        return sample
    # auto-regressive online protocol: re-sample the whole sequence once per
    # revealed condition frame (reference: eval/a2m/stgcn_eval.py:50-67)
    cmotion_bak = cond_np["cmotion"]
    T = cmotion_bak.shape[-1]
    V, C = cmotion_bak.shape[1], cmotion_bak.shape[2]
    revealed = np.zeros_like(cmotion_bak)
    output = np.zeros(
        (cmotion_bak.shape[0], V, C * 2 if setting == "cmdm" else C, T),
        dtype=np.float32,
    )
    for frame_idx in range(T):
        revealed[:, :, :, frame_idx] = cmotion_bak[:, :, :, frame_idx]
        cond_ar = dict(cond, cmotion=jnp.asarray(revealed))
        if mesh is not None and shape[0] % mesh.devices.size == 0:
            from regennet_tpu.parallel import shard_batch

            cond_ar = shard_batch(cond_ar, mesh)
        rng, srng = jax.random.split(rng)
        sample = np.asarray(sample_fn(srng, cond_ar, shape))
        tmp = (
            np.concatenate([revealed, sample], axis=2)
            if setting == "cmdm" else sample
        )
        output[:, :, :, frame_idx] = tmp[:, :, :, frame_idx]
    return output


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
    mesh = _eval_mesh()
    for entry in collect_gen_conds(dataiterator, num_samples):
        rng, step_rng = jax.random.split(rng)
        output = _sample_output(
            sample_fn, step_rng, entry["cond"], entry["shape"], setting,
            auto_regressive, mesh=mesh,
        )
        batches.append(
            {
                "output": output,
                "lengths": entry["lengths"],
                "y": entry["y"],
                "text": entry["text"],
            }
        )
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
    actor_quirks: bool = False,
) -> Dict[str, float]:
    """accuracy/FID/diversity/multimodality for {gen, gt} x {train, test}.

    actor_quirks selects the vendored ACTOR evaluator's diversity variant
    (all-label quotas + 1000-iteration zero bail; reference:
    actor-x/src/evaluate/stgcn/evaluate.py:62-110 with seed=None so the
    draws consume the ambient numpy stream)."""
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
                    feats, labels, evaluator.num_classes, seed=seed,
                    actor_quirks=actor_quirks,
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


def _resolve_seed_batch(args, bs: int) -> int:
    """How many eval seeds to stack into one device batch.

    The reference runs 20 seeds sequentially at eval batch 32 — well under
    the chip's throughput-optimal batch (~128 at flagship shapes). Stacking
    S seeds' same-index batches into one [S*bs] sampling call recovers that
    headroom; rows are independent through the sampler so per-seed metrics
    are unchanged in distribution (noise draws differ from the unstacked
    order, which the protocol permits — it averages over seeds).
    Override with --eval_seed_batch or REGENNET_EVAL_SEED_BATCH; 1 disables.
    """
    import os

    env = os.environ.get("REGENNET_EVAL_SEED_BATCH")
    if env:
        return max(1, int(env))
    explicit = getattr(args, "eval_seed_batch", 0) or 0
    if explicit:
        return max(1, int(explicit))
    return max(1, 128 // max(1, bs))


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
    oracle: bool = False,
) -> Dict:
    """Multi-seed evaluation loop (reference: eval/a2m/stgcn_eval.py:120-205).

    `model_fn_builder()` returns the diffusion ModelFn (CFG already folded if
    requested). Sampling is one jitted scan, compiled once for the batch
    shape and reused across every batch, split, and seed — the reference
    re-launches 1000 Python-step loops per batch. Seeds are additionally
    stacked `seed_batch` at a time into one device call (see
    `_resolve_seed_batch`).

    oracle=True replaces the sampler output with the loader's GT reactor
    motion, routed through the SAME generated-side pipeline (ccollate
    windows, actor‖reactor concat, batch trim, evaluator) — an upper bound
    on what any model can score under this protocol. The gt loaders are
    untouched, so oracle FID measures only the gen-vs-gt pipeline gap.
    """
    bs = args.batch_size
    model_fn = None if oracle else model_fn_builder()

    @functools.partial(jax.jit, static_argnums=(2,))
    def sample_fn(rng, cond, shape):
        return sampling.p_sample_loop(
            sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
        )

    data_types = ["train", "test"]
    datasetGT = {k: copy.deepcopy(data) for k in data_types}
    for k in data_types:
        datasetGT[k].split = k

    seed_batch = min(_resolve_seed_batch(args, bs), args.num_seeds)
    mesh = _eval_mesh()
    stgcn_metrics = {}
    # seed_start: evaluate seeds [start, start+num_seeds) — lets a large
    # multi-seed protocol run be split across PROCESSES (per-seed metrics
    # are independent; fixseed uses absolute seed ids, so a chunked run
    # computes the identical per-seed numbers). Motivated by the axon
    # relay's per-transfer host-memory retention (see CLAUDE.md): a
    # 1000x20 protocol in one process exceeds host RAM.
    seed0 = int(getattr(args, "seed_start", 0) or 0)
    seeds = list(range(seed0, seed0 + args.num_seeds))
    for c0 in range(0, len(seeds), seed_batch):
        chunk = seeds[c0 : c0 + seed_batch]
        # phase 1 (host): per-seed reshuffle + batch materialisation. Each
        # seed's shuffle must fully consume the dataset state before the next
        # seed reshuffles it.
        gt_batches: Dict[int, Dict[str, List[Dict]]] = {}
        gen_entries: Dict[int, Dict[str, List[Dict]]] = {}
        for seed in chunk:
            print(f"Evaluation number: {seed + 1}/{args.num_seeds}")
            fixseed(seed)
            gt_batches[seed] = {}
            gen_entries[seed] = {}
            # consume the seeded python-random stream in the REFERENCE's
            # order (eval/a2m/stgcn_eval.py:163-180): shuffle both splits
            # first, then gt train/test, then gen train/test — the window
            # draws inside dataset iteration advance the same stream, so
            # interleaving differently would select different batches
            for key in data_types:
                datasetGT[key].reset_shuffle()
                datasetGT[key].shuffle()
            for key in data_types:
                gt_iter = BatchLoader(
                    datasetGT[key], bs, collate, shuffle=False, drop_last=True
                )
                gt_batches[seed][key] = build_gt_batches(gt_iter, args.num_samples)
            for key in data_types:
                gen_iter = BatchLoader(
                    datasetGT[key], bs,
                    ccollate if setting == "cmdm" else collate,
                    shuffle=False, drop_last=True,
                )
                gen_entries[seed][key] = collect_gen_conds(
                    gen_iter, args.num_samples, keep_motion=oracle
                )

        # phase 2 (device): sampling, same-index batches stacked across seeds
        gen_batches: Dict[int, Dict[str, List[Dict]]] = {
            seed: {key: [] for key in data_types} for seed in chunk
        }
        for key in data_types:
            entries_by_seed = [gen_entries[seed][key] for seed in chunk]
            num_batches = min(len(e) for e in entries_by_seed)
            for i in range(num_batches):
                group = [e[i] for e in entries_by_seed]
                cond_np = {
                    name: np.concatenate([g["cond"][name] for g in group], axis=0)
                    for name in group[0]["cond"]
                }
                shape = (sum(g["shape"][0] for g in group),) + group[0]["shape"][1:]
                rng = jax.random.fold_in(
                    jax.random.fold_in(sampling_key(chunk[0]), i),
                    data_types.index(key),
                )
                if oracle:
                    motion = np.concatenate(
                        [g["motion"] for g in group], axis=0
                    )
                    output = (
                        np.concatenate([cond_np["cmotion"], motion], axis=2)
                        if setting == "cmdm" else motion
                    )
                else:
                    output = _sample_output(
                        sample_fn, rng, cond_np, shape, setting,
                        auto_regressive, mesh=mesh,
                    )
                offset = 0
                for seed, g in zip(chunk, group):
                    n = g["shape"][0]
                    gen_batches[seed][key].append(
                        {
                            "output": output[offset : offset + n],
                            "lengths": g["lengths"],
                            "y": g["y"],
                            "text": g["text"],
                        }
                    )
                    offset += n
            for seed in chunk:
                _trim_last_batch(gen_batches[seed][key], args.num_samples, bs)

        # phase 3 (host): per-seed metrics. The reference seeds numpy once
        # per evaluation seed (fixseed, stgcn_eval.py:162) and lets the
        # diversity draws consume the ambient stream across the four
        # loader passes (its Evaluation is built with seed=None) — reseed
        # here and pass seed=None down to reproduce that exact stream.
        for seed in chunk:
            np.random.seed(seed)
            loaders = {"gen": gen_batches[seed], "gt": gt_batches[seed]}
            stgcn_metrics[seed] = evaluate_seed_metrics(
                evaluator, loaders, acc_only=acc_only, seed=None
            )
            del loaders

    metrics = {
        "feats": {
            key: [
                "{:.6}".format(stgcn_metrics[seed][key])
                for seed in seeds
            ]
            for key in stgcn_metrics[seeds[0]]
        }
    }
    return metrics

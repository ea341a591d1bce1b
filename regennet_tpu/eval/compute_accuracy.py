"""Recognition-accuracy report for a trained ST-GCN checkpoint —
`python -m regennet_tpu.eval.compute_accuracy`.

Capability parity with the vendored recognition CLI (reference:
actor-x/src/recognition/compute_accuracy.py:16-60): run the frozen
classifier over the train and test splits it was fitted on, accumulate a
confusion matrix per split, and save the per-split accuracies to
``recognition_accuracies_on_samedata_{epoch}.yaml`` next to the
checkpoint.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import collate
from regennet_tpu.data.get_data import BatchLoader, get_dataset
from regennet_tpu.eval.tools import save_metrics
from regennet_tpu.models.stgcn import STGCN
from regennet_tpu.train import checkpoint
from regennet_tpu.utils.fixseed import fixseed


def compute_accuracy(model, variables, loaders, num_classes: int):
    """Per-split accuracy from an explicit confusion matrix (reference:
    actor-x/src/recognition/compute_accuracy.py:16-40)."""

    @jax.jit
    def logits_fn(motion):
        return model.apply(variables, {"output": motion})["yhat"]

    accuracies = {}
    confusions = {}
    for key, loader in loaders.items():
        confusion = np.zeros((num_classes, num_classes), dtype=np.int64)
        for motion, cond in loader:
            labels = np.asarray(cond["y"]["action"][:, 0])
            pred = np.asarray(jnp.argmax(logits_fn(jnp.asarray(motion)), 1))
            np.add.at(confusion, (labels, pred), 1)
        accuracies[key] = float(np.trace(confusion) / confusion.sum())
        confusions[key] = confusion
    return accuracies, confusions


def main(args=None):
    if args is None:
        parser = ArgumentParser()
        parser.add_argument("--checkpoint", required=True, type=str,
                            help="ST-GCN checkpoint dir (from train_stgcn)")
        parser.add_argument("--dataset", default="chi3d",
                            choices=["ntu", "chi3d", "gta"])
        parser.add_argument("--data_path", required=True, type=str)
        parser.add_argument("--pose_rep", default="rot6d", type=str)
        parser.add_argument("--body_model", default="smplx",
                            choices=["smpl", "smplx"])
        parser.add_argument("--num_frames", default=60, type=int)
        parser.add_argument("--batch_size", default=64, type=int)
        parser.add_argument("--seed", default=0, type=int)
        args = parser.parse_args()
    fixseed(args.seed)

    datasets = {
        split: get_dataset(
            name=args.dataset, num_frames=args.num_frames, num_person=2,
            data_path=args.data_path, split=split, setting="mdm",
            pose_rep=args.pose_rep, body_model=args.body_model,
        )
        for split in ("train", "test")
    }
    loaders = {
        key: BatchLoader(ds, args.batch_size, collate, shuffle=False,
                         drop_last=False)
        for key, ds in datasets.items()
    }
    num_classes = datasets["train"].num_actions

    nfeats = {"rot6d": 6, "rotvec": 3, "rotquat": 4}[args.pose_rep] * 2
    model = STGCN(
        in_channels=nfeats, num_class=num_classes, num_person=2,
        layout=args.body_model, strategy="spatial",
        edge_importance_weighting=True,
    )
    variables = checkpoint.load_checkpoint(args.checkpoint)
    epoch = checkpoint.parse_step_from_path(args.checkpoint)

    accuracies, _ = compute_accuracy(model, variables, loaders, num_classes)
    for key, acc in accuracies.items():
        print(f"{key}: accuracy {acc:.4f}", flush=True)

    folder = os.path.dirname(args.checkpoint.rstrip("/"))
    evalpath = os.path.join(
        folder, f"recognition_accuracies_on_samedata_{epoch}.yaml"
    )
    print(f"Saving score: {evalpath}", flush=True)
    save_metrics(evalpath, accuracies)
    return accuracies


if __name__ == "__main__":
    main()

"""Sweep-table generation over saved evaluation YAMLs.

Capability parity with the reference's family of experiment tabulators
(reference: actor-x/src/evaluate/tables/{archtable,bstable,kltable,
numlayertable,posereptable,losstable,maketable}.py): scan an experiment
folder for `evaluation*.yaml` results, group runs by a swept hyperparameter,
and emit plaintext and LaTeX tables of mean ± 1.96·var across seeds with
direction arrows per metric.

The reference hardcodes one script per sweep axis and regex-parses the
hyperparameter out of folder names; here a single `sweep_table(folder,
group_by=...)` reads the value from each run's `args.json` (the framework
always writes one next to its checkpoints), so any recorded argument —
arch, batch_size, lambda_kl, num_layers, pose_rep, ... — is a sweep axis.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from regennet_tpu.eval.tools import load_metrics

UP = r"$\uparrow$"
DOWN = r"$\downarrow$"
RIGHT = r"$\rightarrow$"

# metric improvement directions (reference: tables/maketable.py:14-19)
ARROWS = {
    "accuracy": UP,
    "acceleration": RIGHT,
    "rc": DOWN,
    "fid": DOWN,
    "diversity": RIGHT,
    "multimodality": RIGHT,
}

DEFAULT_KEYS = ["fid", "accuracy", "diversity", "multimodality"]


def valformat(val: float, power: int = 3) -> str:
    """Fixed-precision value formatting (reference: tables/archtable.py:10-13)."""
    p = float(pow(10, power))
    return str(np.round(p * val).astype(int) / p).ljust(4, "0")


def format_values(values: Sequence[float], key: str) -> str:
    """``$mean^{\\pm interval}$`` across seeds (reference: archtable.py:16-30)."""
    values = np.asarray([float(v) for v in values], dtype=np.float64)
    mean = values.mean()
    if key.startswith("accuracy"):
        mean = 100 * mean
        values = 100 * values
        smean = valformat(mean, 1)
    else:
        smean = valformat(mean, 2)
    interval = valformat(1.96 * values.var(), 2)
    return rf"${smean}^{{\pm{interval}}}$"


def _metric_base(key: str) -> str:
    for base in ARROWS:
        if key.startswith(base):
            return base
    return key


def collect_runs(folder: str, pattern: str = "evaluation*.yaml") -> List[Dict]:
    """Find eval YAMLs under ``folder`` and pair each with its run args."""
    runs = []
    for path in sorted(glob.glob(os.path.join(folder, "**", pattern),
                                 recursive=True)):
        run_dir = os.path.dirname(path)
        args_path = os.path.join(run_dir, "args.json")
        args = {}
        if os.path.exists(args_path):
            with open(args_path) as f:
                args = json.load(f)
        metrics = load_metrics(path)
        feats = metrics.get("feats", metrics)
        runs.append({"path": path, "dir": run_dir, "args": args,
                     "feats": feats})
    return runs


def sweep_table(
    folder: str,
    group_by: str,
    keys: Optional[Sequence[str]] = None,
    split: str = "test",
    latex: bool = False,
) -> str:
    """Tabulate metric means across runs grouped by one swept argument.

    ``group_by`` is any key recorded in each run's args.json (e.g. 'arch',
    'batch_size', 'lambda_kl', 'num_layers', 'pose_rep'). ``keys`` are
    metric prefixes; the `gen` series of the requested split is used when
    present (matching the reference tables, which report generated-motion
    metrics).
    """
    keys = list(keys or DEFAULT_KEYS)
    runs = collect_runs(folder)
    if not runs:
        return f"(no evaluation results under {folder})"

    rows = []
    for run in runs:
        label = str(run["args"].get(group_by, "?"))
        cells = []
        for key in keys:
            candidates = [
                f"{key}_gen_{split}", f"{key}_gen", f"{key}_{split}", key,
            ]
            found = next(
                (c for c in candidates if c in run["feats"]), None
            )
            if found is None:
                cells.append("--")
            else:
                cells.append(format_values(run["feats"][found], key))
        rows.append((label, cells))
    # numeric sweep axes (batch_size 8/16/32, lambda values) sort by value,
    # not lexicographically (which would give 16, 32, 8)
    try:
        rows.sort(key=lambda r: float(r[0]))
    except ValueError:
        rows.sort(key=lambda r: r[0])

    header = [group_by] + [
        f"{k} {ARROWS[_metric_base(k)]}" if latex else k for k in keys
    ]
    if latex:
        lines = [" & ".join(header) + r" \\", r"\hline"]
        lines += [" & ".join([label] + cells) + r" \\" for label, cells in rows]
        return "\n".join(lines)
    widths = [
        max(len(str(header[i])),
            max((len(r[1][i - 1]) if i else len(r[0])) for r in rows))
        for i in range(len(header))
    ]
    out = ["  ".join(str(h).ljust(w) for h, w in zip(header, widths))]
    for label, cells in rows:
        out.append(
            "  ".join(c.ljust(w) for c, w in zip([label] + cells, widths))
        )
    return "\n".join(out)


def main(args=None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("folder", type=str)
    p.add_argument("--group_by", default="arch", type=str)
    p.add_argument("--keys", default=",".join(DEFAULT_KEYS), type=str)
    p.add_argument("--split", default="test", type=str)
    p.add_argument("--latex", action="store_true")
    a = p.parse_args(args)
    print(sweep_table(a.folder, a.group_by, a.keys.split(","), a.split,
                      a.latex))


if __name__ == "__main__":
    main()

"""Composite train->sample->eval capability guard (slow tier).

Runs scripts/capability_study.py at its `smokefit` scale — the smallest
configuration that measurably LEARNS on the CPU mesh (~12 min: reduced
4-block ST-GCN evaluator reaching GT accuracy 1.0 at 24-frame windows,
an 800-step CMDM, the full eval_cmdm multi-seed protocol, a random-init
control and the GT-through-gen-pipeline oracle row) — and asserts the
DISCRIMINATION DIRECTION: trained beats chance and random-init, FID
collapses vs random, the oracle ceiling holds. A quiet break anywhere in
the composite (e.g. another BatchNorm-momentum-class bug, a sampler/cond
regression, an evaluator feature change) turns this red.

The reference's only analogue is the DIFFUSION_TRAINING_TEST hook
(reference: train/training_loop.py:209-211) — this is strictly stronger:
it checks the system learns, not just that losses run.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_capability_smokefit_discriminates(tmp_path):
    out = tmp_path / "capability_smokefit.json"
    workdir = tmp_path / "capwd"  # must not contain 'train' (Feeder rule)
    proc = subprocess.run(
        [
            sys.executable, "-u",
            os.path.join(REPO, "scripts", "capability_study.py"),
            "--scale", "smokefit", "--backend", "cpu",
            "--out", str(out), "--workdir", str(workdir),
        ],
        capture_output=True, text=True, timeout=2400, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"capability smokefit failed rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-2000:]}\n"
        f"stderr tail: {proc.stderr[-2000:]}"
    )
    with open(out) as f:
        art = json.load(f)

    # the script's own direction checks must all hold...
    assert art["ok"], art["checks"]
    # ...and the numbers must discriminate by comfortable margins
    acc_tr = art["trained"]["accuracy_gen_test"]["mean"]
    acc_rd = art["random_init"]["accuracy_gen_test"]["mean"]
    fid_tr = art["trained"]["fid_gen_test"]["mean"]
    fid_rd = art["random_init"]["fid_gen_test"]["mean"]
    acc_or = art["oracle"]["accuracy_gen_test"]["mean"]
    fid_or = art["oracle"]["fid_gen_test"]["mean"]
    chance = 1.0 / 8.0
    assert art["evaluator"]["gt_test_accuracy"] >= 0.6
    assert acc_tr > chance + 0.10, (acc_tr, chance)
    assert acc_tr > acc_rd, (acc_tr, acc_rd)
    assert fid_tr < 0.25 * fid_rd, (fid_tr, fid_rd)
    # oracle: the gen-side pipeline preserves the GT signal (accuracy) and
    # distribution (FID ~ 0), and bounds the trained row
    assert acc_or >= 0.5
    assert fid_or < 0.1 * max(fid_tr, 1e-9)
    assert acc_tr <= acc_or + 0.05

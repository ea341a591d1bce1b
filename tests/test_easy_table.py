"""easy_table: formatting and full-mode tabulation."""

import numpy as np
import yaml

from regennet_tpu.eval.easy_table import format_values, print_results


def test_format_values():
    values = np.asarray([0.5, 0.52, 0.48])
    s = format_values(values, "fid_gen", latex=False)
    assert "0.5" in s and "+/-" in s
    s_latex = format_values(values, "fid_gen", latex=True)
    assert s_latex.startswith("$") and "\\pm" in s_latex


def test_print_results_full_mode(tmp_path, capsys):
    feats = {}
    rng = np.random.default_rng(0)
    for model in ["gen", "gt"]:
        for split in ["train", "test"]:
            for metric in ["fid", "accuracy", "diversity", "multimodality"]:
                feats[f"{metric}_{model}_{split}"] = [
                    f"{rng.uniform(0, 1):.6f}" for _ in range(3)
                ]
    path = tmp_path / "evaluation_results_full.yaml"
    with open(path, "w") as f:
        yaml.dump({"feats": feats}, f)
    print_results(str(tmp_path), "evaluation_results_full.yaml")
    out = capsys.readouterr().out
    assert "Results" in out and "gen" in out
    assert "Latex table" in out and "\\pm" in out

"""The learnable action-conditioned synthetic task (data/synthetic.py
make_action_clip): labels must be recoverable FROM the motion, so the
evaluation stack can demonstrate end-to-end that trained models beat
untrained ones — the one capability of the reference eval harness
(reference: eval/a2m/stgcn_eval.py:120-205 with eval/a2m/stgcn/accuracy.py)
that index-modulo labels cannot exercise.

The full capability study (evaluator >= 90% GT accuracy; trained CMDM far
ahead of random-init through the eval_cmdm protocol) runs in
scripts/capability_study.py -> docs/capability_r4.json; these tests pin
the properties it relies on at a scale the suite can afford.
"""

import numpy as np
import pytest

from regennet_tpu.data import synthetic
from regennet_tpu.data.feeder import Feeder


@pytest.fixture(scope="module")
def learnable_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds_learn")
    return synthetic.make_dataset_pair(
        str(root), "chi3d", num_clips=64, learnable=True,
        min_len=70, max_len=110,
    )


def _reactor_peak_bin(item):
    """Dominant FFT bin of the reactor's rot6d pose channels."""
    x = item["inp"]  # [V+1, 12, T]
    sig = x[:-1, 6:12, :].reshape(-1, x.shape[-1])
    spec = np.abs(
        np.fft.rfft(sig - sig.mean(-1, keepdims=True), axis=-1)
    ).mean(0)
    return int(np.argmax(spec[1:]) + 1)


def test_action_signatures_survive_data_path(learnable_path):
    """Per-action frequency signatures must separate cleanly AFTER the
    full load path (conseq windowing with random shift, axis-angle ->
    rot6d conversion, translation re-basing)."""
    f = Feeder(learnable_path, num_frames=60, num_person=2, split="train",
               pose_rep="rot6d", dataname="chi3d", body_model="smplx")
    bins = {}
    for i in range(len(f._train)):
        item = f._sample_item(f._train[i])
        bins.setdefault(item["action"], set()).add(_reactor_peak_bin(item))
    assert sorted(bins) == list(range(8))
    # within-action consistency: one dominant bin per action
    for a, bs in bins.items():
        assert len(bs) == 1, (a, bs)
    # across-action separation: no bin shared between actions
    all_bins = [next(iter(bs)) for _, bs in sorted(bins.items())]
    assert len(set(all_bins)) == 8, all_bins
    # monotone in action index (frequency ramp)
    assert all_bins == sorted(all_bins)


def test_actor_signature_mild_reactor_strong(learnable_path):
    """The reactor carries the stronger class signal (its per-action
    sinusoid amplitude dominates), keeping generated-reaction metrics
    sensitive to the synthesised half rather than the GT actor half."""
    f = Feeder(learnable_path, num_frames=60, num_person=2, split="train",
               pose_rep="rotvec", dataname="chi3d", body_model="smplx")
    ratios = []
    for i in range(0, len(f._train), 4):
        item = f._sample_item(f._train[i])
        x = item["inp"]  # [V+1, 6, T] rotvec
        pa = x[:-1, 0:3, :]
        pr = x[:-1, 3:6, :]

        def osc_power(p):
            d = p - p.mean(-1, keepdims=True)
            return float((d ** 2).mean())

        ratios.append(osc_power(pr) / max(osc_power(pa), 1e-9))
    assert np.median(ratios) > 1.5, np.median(ratios)


def test_determinism_and_label_balance(tmp_path):
    a = synthetic.write_dataset(str(tmp_path / "a.h5"), "chi3d", "train",
                                num_clips=16, learnable=True, seed=3)
    b = synthetic.write_dataset(str(tmp_path / "b.h5"), "chi3d", "train",
                                num_clips=16, learnable=True, seed=3)
    import h5py

    with h5py.File(a) as fa, h5py.File(b) as fb:
        assert list(fa.keys()) == list(fb.keys())
        for k in fa:
            np.testing.assert_array_equal(fa[k][:], fb[k][:])
        labels = [int(k.split("_")[-1]) for k in fa]
    assert sorted(set(labels)) == list(range(8))


@pytest.mark.slow
def test_stgcn_learns_the_task(tmp_path_factory):
    """A short ST-GCN run on the learnable task must climb far above
    chance (0.125) IN EVAL MODE (running batch stats — the mode the eval
    harness uses; this is the regression test for the BatchNorm-momentum
    defect the learnable task exposed: torch-parity momentum 0.9, see
    models/stgcn.py). The index-modulo generator demonstrably cannot do
    this (the round-3 fidelity study measured exact chance on it). The
    full-size study lives in scripts/capability_study.py; here a
    reduced-depth ST-GCN keeps the CPU cost suite-friendly."""
    from argparse import Namespace

    from regennet_tpu.eval.train_stgcn import run_training

    root = tmp_path_factory.mktemp("ds_learn_stgcn")
    path = synthetic.make_dataset_pair(
        str(root), "chi3d", num_clips=96, learnable=True,
        min_len=30, max_len=48,
    )
    args = Namespace(
        dataset="chi3d", data_path=path, pose_rep="rot6d",
        body_model="smplx", glob=True, translation=True, num_frames=24,
        batch_size=24, lr=2e-3, num_epochs=10, save_every=100,
        save_dir=str(tmp_path_factory.mktemp("stgcn_save")), seed=0,
        stgcn_channels=(32, 64), stgcn_strides=(1, 2),
    )
    variables = run_training(args)

    # measure held-out accuracy directly, eval mode (running BN stats)
    import jax.numpy as jnp

    from regennet_tpu.data.collate import collate
    from regennet_tpu.data.get_data import BatchLoader, get_dataset
    from regennet_tpu.models.stgcn import STGCN

    test_ds = get_dataset(
        name="chi3d", num_frames=24, num_person=2, data_path=path,
        split="test", setting="mdm", pose_rep="rot6d", body_model="smplx",
    )
    loader = BatchLoader(test_ds, 24, collate, shuffle=False,
                         drop_last=False)
    model = STGCN(in_channels=12, num_class=8, num_person=2,
                  layout="smplx", strategy="spatial",
                  edge_importance_weighting=True,
                  channels=(32, 64), strides=(1, 2))
    accs = []
    for motion, cond in loader:
        out = model.apply(variables, {"output": jnp.asarray(motion)})
        labels = jnp.asarray(cond["y"]["action"][:, 0])
        accs.append(
            np.asarray(jnp.argmax(out["yhat"], axis=1) == labels)
        )
    acc = float(np.concatenate(accs).mean())
    assert acc >= 0.5, f"eval-mode test accuracy {acc} (chance 0.125)"

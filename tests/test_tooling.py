"""Offline tooling tests: renderer, edit CLI, predict wrapper, preprocess
scripts, and joints2smpl fitting."""

import os
from argparse import Namespace

import h5py
import jax
import numpy as np
import pytest

from regennet_tpu.data import synthetic


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("toolds")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=8)


def test_renderer_writes_video(tmp_path):
    from regennet_tpu.render.renderer import render_video

    joints = np.random.default_rng(0).normal(size=(2, 55, 3, 6)).astype(np.float32)
    path = render_video(joints, str(tmp_path / "clip.gif"), fps=5, title="test")
    assert os.path.exists(path)
    assert os.path.getsize(path) > 1000


def test_crendermotion_from_results(tmp_path, data_path):
    from regennet_tpu.render import crendermotion

    # fabricate a small results.npy in the cgenerate format
    rng = np.random.default_rng(0)
    results = {
        "output": rng.normal(size=(2, 56, 6, 6)).astype(np.float32) * 0.3,
        "cmotion": rng.normal(size=(2, 56, 6, 6)).astype(np.float32) * 0.3,
        "motion": rng.normal(size=(2, 55, 3, 6)).astype(np.float32),
        "text": ["Hug", "Kick"],
        "lengths": np.asarray([6, 6]),
    }
    npy = str(tmp_path / "results.npy")
    np.save(npy, results)
    args = Namespace(
        data_path=npy, output_dir=str(tmp_path / "videos"),
        body_model="smplx", jointstype=None, fps=5, num_videos=1,
    )
    paths = crendermotion.main(args)
    assert len(paths) == 1 and os.path.exists(paths[0])


def test_edit_inpainting_masks():
    from regennet_tpu.sample.edit import build_inpainting_cond

    motion = np.random.randn(2, 56, 6, 20).astype(np.float32)
    cond = build_inpainting_cond(motion, "in_between", 0.25, 0.75)
    m = np.asarray(cond["inpainting_mask"])
    assert m[:, :, :, :5].all() and m[:, :, :, 15:].all()
    assert not m[:, :, :, 5:15].any()

    cond = build_inpainting_cond(motion, "upper_body", 0.25, 0.75)
    m = np.asarray(cond["inpainting_mask"])
    assert m[:, 0].all() and m[:, 55].all()  # pelvis + translation kept
    assert not m[:, 20].any()  # an upper-body joint is generated

    # per-sample lengths scale the in_between boundaries; the kept suffix
    # still runs to max_frames (reference: sample/edit.py:77-81)
    cond = build_inpainting_cond(
        motion, "in_between", 0.25, 0.75, lengths=[20, 12]
    )
    m = np.asarray(cond["inpainting_mask"])
    assert m[1, :, :, :3].all() and m[1, :, :, 9:].all()
    assert not m[1, :, :, 3:9].any()
    assert m[0, :, :, :5].all() and not m[0, :, :, 5:15].any()

    with pytest.raises(ValueError):
        build_inpainting_cond(motion, "bogus", 0.25, 0.75)


def test_edit_end_to_end(tmp_path, data_path):
    from regennet_tpu.sample import edit

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=4, use_ddim=True,
        timestep_respacing="ddim5", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True, setting="cmdm", arch="online",
        emb_trans_dec=False, wo_pos_emb=False, cm_mode="concat", layers=2,
        latent_dim=32, cond_mask_prob=0.1, lambda_rcxyz=0.0, lambda_vel=0.0,
        lambda_fc=0.0, lambda_orient=1.0, lambda_body=1.0, lambda_transl=1.0,
        unconstrained=False, dataset="chi3d", data_dir="", num_person=2,
        data_path=data_path, pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False, model_path="random",
        output_dir=str(tmp_path / "edit"), num_samples=4, num_repetitions=1,
        guidance_param=1.0, edit_mode="in_between", text_condition="",
        prefix_end=0.25, suffix_start=0.75, num_frames=16,
    )
    npy = edit.main(args)
    results = np.load(npy, allow_pickle=True).item()
    out, inp = results["output"], results["input_motion"]
    mask = results["inpainting_mask"]
    # inpainted regions must exactly carry the input motion
    np.testing.assert_allclose(out[mask], inp[mask], atol=1e-4)
    # generated region must differ from the input
    assert np.abs(out[~mask] - inp[~mask]).max() > 1e-3


def test_predict_wrapper(tmp_path, data_path):
    import json

    import jax.numpy as jnp

    from regennet_tpu.models.cmdm import CMDM
    from regennet_tpu.sample.predict import Predictor
    from regennet_tpu.train import checkpoint

    save_dir = tmp_path / "ckpt"
    save_dir.mkdir()
    margs = dict(
        setting="cmdm", arch="online", emb_trans_dec=False, wo_pos_emb=False,
        cm_mode="concat", layers=2, latent_dim=32, cond_mask_prob=0.1,
        lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0, lambda_orient=1.0,
        lambda_body=1.0, lambda_transl=1.0, unconstrained=False,
        dataset="chi3d", num_person=2, data_path=data_path, pose_rep="rot6d",
        body_model="smplx", vel_threshold=0.01, noise_schedule="cosine",
        diffusion_steps=50, sigma_small=True, timestep_respacing="",
        num_frames=8,
    )
    json.dump(margs, open(save_dir / "args.json", "w"))
    model = CMDM(njoints=56, nfeats=6, num_actions=8, num_frames=8,
                 latent_dim=32, ff_size=1024, num_layers=2, num_heads=4,
                 arch="online", cm_mode="concat", cond_mode="action")
    x = jnp.zeros((1, 56, 6, 8))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
        {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)},
    )["params"]
    ckpt = checkpoint.save_checkpoint(str(save_dir), 7, {"params": params})

    # NOTE: Predictor reads num_frames from args.json but chi3d maps to 150;
    # pass cmotion with the model's true frame count
    p = Predictor()
    p.setup(ckpt, guidance_param=1.0)
    cm = np.random.randn(2, 56, 6, p.num_frames).astype(np.float32)
    # model trained at 8 frames here; override
    cm = cm[:, :, :, :8]
    out = p.predict(cm, action=np.asarray([[1], [2]]))
    assert out.shape == cm.shape
    assert np.isfinite(out).all()


class TestPreprocess:
    def test_actor_reactor_swap(self, tmp_path):
        from regennet_tpu.preprocess import actor_reactor

        src = tmp_path / "src.h5"
        labels = tmp_path / "labels"
        labels.mkdir()
        rng = np.random.default_rng(0)
        with h5py.File(src, "w") as f:
            for name, label in [("clipA", 0), ("clipB", 1)]:
                f.create_dataset(
                    name, data=rng.normal(size=(5, 56, 6)).astype(np.float32)
                )
                (labels / f"{name}.mp4.txt").write_text(f"{label}\n")
        dest = tmp_path / "dest.h5"
        actor_reactor.main(Namespace(src=str(src), dest=str(dest),
                                     label_folder=str(labels)))
        with h5py.File(src) as fs, h5py.File(dest) as fd:
            np.testing.assert_array_equal(fd["clipA"][:], fs["clipA"][:])
            np.testing.assert_array_equal(
                fd["clipB"][:, :, 0:3], fs["clipB"][:, :, 3:6]
            )

    def test_split_2p(self, tmp_path):
        from regennet_tpu.preprocess import split_2p

        src = tmp_path / "ntu.h5"
        rng = np.random.default_rng(0)
        with h5py.File(src, "w") as f:
            # subject 1 (train), subject 3 (test); class 50 (kept), 10 (dropped)
            for name in ["S001C001P001R001A050", "S001C001P003R001A050",
                         "S001C001P001R001A010", "S001C001P001R001A106"]:
                f.create_dataset(name, data=rng.normal(size=(5, 56, 6)))
        out = tmp_path / "splits"
        split_2p.main(Namespace(data_path=str(src), out_path=str(out)))
        with h5py.File(out / "xsub.train.h5") as f:
            names = sorted(f.keys())
            # class 50 -> 001, class 106 -> 012
            assert names == ["S001C001P001R001A001", "S001C001P001R001A012"]
        with h5py.File(out / "xsub.test.h5") as f:
            assert list(f.keys()) == ["S001C001P003R001A001"]


def test_joints2smpl_fitting():
    from regennet_tpu.ops import body_model as bm, lbs, rotations as geo
    from regennet_tpu.visualize.joints2smpl import fit_sequence

    model = bm.synthetic("smplx", num_vertices=16)
    # ground-truth pose -> joints -> fit -> joints must match
    import jax.numpy as jnp

    T = 3
    gt_aa = jax.random.normal(jax.random.PRNGKey(0), (T, 55, 3)) * 0.2
    gt_rot = geo.axis_angle_to_matrix(gt_aa)
    gt_joints = np.asarray(lbs.joints(model, gt_rot))
    gt_joints = gt_joints - gt_joints[:, :1]

    result = fit_sequence(model, gt_joints, num_steps=150, lr=0.05,
                          w_smooth=0.0, w_prior=1e-4)
    fitted_rot = geo.rotation_6d_to_matrix(jnp.asarray(result["pose6d"]))
    fitted = np.asarray(lbs.joints(model, fitted_rot))
    fitted = fitted - fitted[:, :1]
    rmse = np.sqrt(np.mean((fitted - gt_joints) ** 2))
    assert rmse < 0.05, rmse
    assert result["losses"][-1] < result["losses"][0] * 0.1


class TestKVLoggerFormats:
    def test_json_and_tensorboard_writers(self, tmp_path):
        from regennet_tpu.utils import kvlogger

        log = kvlogger.Logger(str(tmp_path), ("json",))
        log.logkv("step", 1)
        log.logkv_mean("loss", 2.0)
        log.logkv_mean("loss", 4.0)
        log.dumpkvs()
        log.logkv("step", 2)
        log.logkv("loss", 1.0)
        log.dumpkvs()
        import json as _json

        lines = [
            _json.loads(ln)
            for ln in open(tmp_path / "progress.json").read().splitlines()
        ]
        assert lines[0]["loss"] == 3.0 and lines[1]["step"] == 2

        tb = kvlogger.Logger(str(tmp_path), ("tensorboard",))
        tb.logkv("step", 1)
        tb.logkv("loss", 0.5)
        tb.dumpkvs()
        import os as _os

        assert any(
            f.startswith("events") for f in _os.listdir(tmp_path / "tb")
        )

    def test_env_format_override(self, tmp_path, monkeypatch):
        from regennet_tpu.utils import kvlogger

        monkeypatch.setenv("REGENNET_LOG_FORMAT", "json")
        log = kvlogger.configure(str(tmp_path))
        assert len(log.writers) == 1
        assert type(log.writers[0]).__name__ == "JSONOutputFormat"


def test_fit_seq_cli(tmp_path):
    """fit_seq fits every joints file and writes fit_params + OBJ frames
    (reference: visualize/joints2smpl/fit_seq.py)."""
    from regennet_tpu.ops import body_model as bm, lbs, rotations as geo
    from regennet_tpu.visualize import fit_seq

    model = bm.synthetic("smplx", num_vertices=16)
    import jax.numpy as jnp

    gt_aa = jax.random.normal(jax.random.PRNGKey(1), (2, 55, 3)) * 0.1
    gt_joints = np.asarray(lbs.joints(model, geo.axis_angle_to_matrix(gt_aa)))
    gt_joints = gt_joints - gt_joints[:, :1]
    data = tmp_path / "joints"
    data.mkdir()
    np.save(data / "clip0.npy", gt_joints)

    args = fit_seq.parse_args([
        "--data_folder", str(data), "--save_folder", str(tmp_path / "out"),
        "--num_smplify_iters", "50",
    ])
    # the CLI loads the real body model by name; use the synthetic directly
    import regennet_tpu.ops.body_model as bmod
    orig = bmod.get_body_model
    bmod.get_body_model = lambda name: model
    try:
        results = fit_seq.main(args)
    finally:
        bmod.get_body_model = orig
    assert "clip0.npy" in results
    out = tmp_path / "out" / "clip0"
    assert (out / "fit_params.npz").exists()
    objs = sorted(out.glob("frame*.obj"))
    assert len(objs) == 2
    fit = np.load(out / "fit_params.npz")
    assert fit["pose6d"].shape == (2, 55, 6)
    assert fit["losses"][-1] < fit["losses"][0]


def test_step_timer_and_trace(tmp_path):
    """Profiling hooks (SURVEY §5): StepTimer percentiles exclude warmup;
    trace() writes a loadable device trace directory."""
    import time as _time

    from regennet_tpu.utils import profiling

    timer = profiling.StepTimer(warmup=1)
    for _ in range(5):
        timer.tick()
        _time.sleep(0.01)
    s = timer.summary()
    assert set(s) == {"step_ms_p50", "step_ms_p90", "steps_per_sec"}
    assert 5 <= s["step_ms_p50"] <= 100
    assert profiling.StepTimer().summary() == {}

    import jax.numpy as jnp

    with profiling.trace(str(tmp_path / "trace")):
        with profiling.annotate("matmul"):
            (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found += [f for f in files if f.endswith((".pb", ".json.gz", ".xplane.pb"))]
    assert found, "no trace artifacts written"


class TestBenchFallback:
    """bench.py's one-JSON-line driver contract under TPU-relay failure."""

    def _load_bench(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_unreachable_emits_stale_cached_line(self, tmp_path, monkeypatch,
                                                 capsys):
        import json

        bench = self._load_bench()
        cache = tmp_path / "bench_last.json"
        metric = "reaction_seqs_per_sec_per_chip_ddpm1000_chi3d150"
        cache.write_text(json.dumps({metric: {
            "metric": metric, "value": 24.86, "unit": "seqs/s/chip",
            "vs_baseline": 2.762, "mfu": 0.703,
        }}))
        monkeypatch.setattr(bench, "_LAST_RESULT_PATH", str(cache))
        monkeypatch.setattr(bench, "_acquire_devices", lambda t: {})
        monkeypatch.setenv("BENCH_DEVICE_TIMEOUT", "1")
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        assert len(lines) == 1
        out = json.loads(lines[0])
        assert out["metric"] == metric
        assert out["value"] == 24.86 and out["stale"] is True
        assert "unreachable" in out["error"]

    def test_unreachable_without_cache_emits_zero_line(self, tmp_path,
                                                       monkeypatch, capsys):
        import json

        bench = self._load_bench()
        monkeypatch.setattr(bench, "_LAST_RESULT_PATH",
                            str(tmp_path / "missing.json"))
        monkeypatch.setattr(bench, "_acquire_devices", lambda t: {})
        bench.main()
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        out = json.loads(lines[0])
        assert out["value"] == 0.0 and "stale" not in out
        assert "unreachable" in out["error"]

    def test_emit_records_cache(self, tmp_path, monkeypatch, capsys):
        import json

        bench = self._load_bench()
        cache = tmp_path / "bench_last.json"
        monkeypatch.setattr(bench, "_LAST_RESULT_PATH", str(cache))
        monkeypatch.setattr(bench, "_CACHE_DIR", str(tmp_path))
        payload = {"metric": "m", "value": 1.5, "unit": "u",
                   "vs_baseline": 0.5}
        bench._emit(payload)
        assert json.loads(capsys.readouterr().out.strip()) == payload
        assert json.loads(cache.read_text())["m"]["value"] == 1.5

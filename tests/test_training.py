"""Training runtime tests on the virtual 8-device CPU mesh: data-parallel +
tensor-parallel train steps, loss descent, checkpoint/resume, CLI."""

import os
from argparse import Namespace

import jax
import numpy as np
import pytest

from regennet_tpu.data import synthetic


def _train_args(tmp_path, data_path, **overrides):
    base = dict(
        cuda=True, device=0, seed=10, batch_size=8, use_ddim=False,
        timestep_respacing="", noise_schedule="cosine", diffusion_steps=100,
        sigma_small=True,
        setting="cmdm", arch="online", emb_trans_dec=False, wo_pos_emb=False,
        cm_mode="concat", layers=2, latent_dim=32, cond_mask_prob=0.1,
        lambda_rcxyz=0.0, lambda_vel=1.0, lambda_fc=0.0, lambda_orient=1.0,
        lambda_body=1.0, lambda_transl=1.0, unconstrained=False,
        dataset="chi3d", data_dir="", num_person=2, data_path=data_path,
        pose_rep="rot6d", body_model="smplx", vel_threshold=0.01, shuffle=False,
        save_dir=str(tmp_path / "save"), overwrite=True,
        train_platform_type="NoPlatform", lr=1e-3, weight_decay=0.0,
        lr_anneal_steps=0, eval_batch_size=32, eval_split="test",
        eval_during_training=False, eval_rep_times=3, eval_num_samples=1000,
        log_interval=5, save_interval=100, num_steps=10, num_frames=16,
        resume_checkpoint="", data_parallel=-1, tensor_parallel=1,
        compute_dtype="float32",
    )
    base.update(overrides)
    return Namespace(**base)


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds_tr")
    return synthetic.make_dataset_pair(str(root), "chi3d", num_clips=16)


def test_train_mdm_end_to_end(tmp_path, data_path):
    from regennet_tpu.train import train_mdm

    args = _train_args(tmp_path, data_path)
    train_mdm.main(args)
    # args.json + final checkpoint written
    assert os.path.exists(os.path.join(args.save_dir, "args.json"))
    from regennet_tpu.train.checkpoint import latest_checkpoint

    ckpt = latest_checkpoint(args.save_dir)
    assert ckpt is not None


def test_loss_decreases(tmp_path, data_path):
    """A few dozen steps on a tiny model must reduce the diffusion loss."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    args = _train_args(
        tmp_path, data_path, num_steps=40, log_interval=1000,
        save_interval=10_000, lambda_orient=0.0, lambda_body=0.0,
        lambda_transl=0.0, lambda_vel=0.0,
    )
    data = get_dataset_loader(
        name="chi3d", batch_size=args.batch_size, num_frames=args.num_frames,
        num_person=2, data_path=data_path, setting="cmdm",
        pose_rep="rot6d", body_model="smplx",
    )
    model, sched, cfg = create_model_and_diffusion(args, data)
    loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)

    first_losses, last_losses = [], []
    step = 0
    for _ in range(100):
        for motion, cond in data:
            m = loop.run_step(motion, cond)
            val = float(m["loss"])
            if step < 5:
                first_losses.append(val)
            last_losses.append(val)
            step += 1
            if step >= 40:
                break
        if step >= 40:
            break
    assert np.mean(last_losses[-5:]) < np.mean(first_losses) * 0.8


def test_checkpoint_resume(tmp_path, data_path):
    from regennet_tpu.train import train_mdm
    from regennet_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        parse_step_from_path,
    )

    args = _train_args(
        tmp_path, data_path, num_steps=4, save_interval=2, log_interval=100
    )
    train_mdm.main(args)
    ckpt = latest_checkpoint(args.save_dir)
    step0 = parse_step_from_path(ckpt)
    assert step0 > 0

    # resume and train further
    args2 = _train_args(
        tmp_path, data_path, num_steps=step0 + 2, save_interval=1000,
        log_interval=100, overwrite=True,
    )
    train_mdm.main(args2)
    ckpt2 = latest_checkpoint(args2.save_dir)
    assert parse_step_from_path(ckpt2) > step0
    restored = load_checkpoint(ckpt2)
    assert "params" in restored and "ema_params" in restored


def test_tensor_parallel_train_step(tmp_path, data_path):
    """2-way TP x 4-way DP on the virtual mesh must produce the same loss
    trajectory shape (finite, decreasing-capable) as pure DP."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    assert len(jax.devices()) == 8, "test expects the virtual 8-device mesh"
    args = _train_args(
        tmp_path, data_path, data_parallel=4, tensor_parallel=2,
        latent_dim=64, num_steps=3,
    )
    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=args.num_frames, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx",
    )
    model, sched, cfg = create_model_and_diffusion(args, data)
    loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)
    assert loop.mesh.shape == {"data": 4, "model": 2}

    # params actually sharded over the model axis
    from regennet_tpu.parallel.mesh import param_shardings

    sh = param_shardings(loop.state["params"], loop.mesh)
    specs = {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    assert any("model" in str(v) for v in specs.values())

    motion, cond = next(iter(data))
    m1 = loop.run_step(motion, cond)
    assert np.isfinite(float(m1["loss"]))


def test_dp_and_tp_agree(tmp_path, data_path):
    """One train step under pure-DP and DP+TP must give the same loss."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    losses = {}
    for tp in (1, 2):
        args = _train_args(
            tmp_path, data_path, data_parallel=8 // tp if tp == 2 else -1,
            tensor_parallel=tp, latent_dim=64, dropout=0.0,
            save_dir=str(tmp_path / f"save_tp{tp}"),
        )
        data = get_dataset_loader(
            name="chi3d", batch_size=8, num_frames=args.num_frames,
            num_person=2, data_path=data_path, setting="cmdm",
            pose_rep="rot6d", body_model="smplx", loader_shuffle=False,
        )
        model, sched, cfg = create_model_and_diffusion(args, data)
        loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)
        motion, cond = next(iter(data))
        m = loop.run_step(motion, cond)
        losses[tp] = float(m["loss"])
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-2)


def test_steps_per_call_block_matches_single_steps(tmp_path, data_path):
    """--steps_per_call K (K optimizer steps fused into one lax.scan device
    call — absent in the reference, which runs one step per Python
    iteration) must reproduce the single-step path exactly: same per-step
    losses, same final parameters, on the same batch sequence."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=16, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx", loader_shuffle=False,
    )
    batches = []
    while len(batches) < 3:  # len(data) == 2: cycle for a third batch
        for motion, cond in data:
            batches.append((motion, cond))
            if len(batches) == 3:
                break

    argsA = _train_args(tmp_path, data_path,
                        save_dir=str(tmp_path / "save_single"))
    model, sched, cfg = create_model_and_diffusion(argsA, data)
    loopA = TrainLoop(argsA, NoPlatform(argsA.save_dir), model, sched, cfg, data)
    losses_single = [
        float(loopA.run_step(m, c)["loss"]) for m, c in batches
    ]

    argsB = _train_args(tmp_path, data_path, steps_per_call=3,
                        save_dir=str(tmp_path / "save_block"))
    model, sched, cfg = create_model_and_diffusion(argsB, data)
    loopB = TrainLoop(argsB, NoPlatform(argsB.save_dir), model, sched, cfg, data)
    per_step = loopB.run_block(batches)
    losses_block = [float(m["loss"]) for m in per_step]

    np.testing.assert_allclose(losses_block, losses_single, rtol=1e-6)
    pa = jax.device_get(loopA.state["params"])
    pb = jax.device_get(loopB.state["params"])
    for a, b in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    assert int(jax.device_get(loopB.state["step"])) == 3


def test_steps_per_call_mdm_e2e(tmp_path, tmp_path_factory):
    """End-to-end --steps_per_call run through train_mdm.main: full blocks,
    the partial-block epoch-boundary flush, boundary saves, and a restorable
    final checkpoint stamped with the true step count."""
    from regennet_tpu.train import train_mdm
    from regennet_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        parse_step_from_path,
    )

    # 32 clips at batch 8 -> len(data) = 4; steps_per_call=3 -> each epoch
    # runs one 3-step block plus one single-step epoch-boundary flush.
    # (dataset dir via mktemp: the Feeder's 'train'->'test' path-substitution
    # parity quirk forbids 'train' anywhere in the dataset path)
    big = synthetic.make_dataset_pair(
        str(tmp_path_factory.mktemp("ds_spc")), "chi3d", num_clips=32
    )
    args = _train_args(
        tmp_path, big, steps_per_call=3, num_steps=20,
        save_interval=5, log_interval=2,
    )
    train_mdm.main(args)
    ckpt = latest_checkpoint(args.save_dir)
    assert ckpt is not None
    # reference epoch formula: num_epochs = 20 // (len(data)+1) = 4 epochs
    # x 4 steps/epoch = 16 steps
    assert parse_step_from_path(ckpt) == 16
    restored = load_checkpoint(ckpt)
    assert "params" in restored and "ema_params" in restored


def test_diffusion_training_test_consistent_across_k(tmp_path,
                                                     tmp_path_factory,
                                                     monkeypatch):
    """DIFFUSION_TRAINING_TEST must early-exit at the first save whose
    CROSSING step is > 0 — identically for steps_per_call K=1 and K>1.
    The K>1 first block contains the step-0 save crossing; a
    post-increment test (self.step - 1 > 0) would exit there immediately
    while the single-step path continues to the next boundary."""
    from regennet_tpu.train import train_mdm

    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    # 32 clips at batch 8 -> len(data) = 4; K=3 -> per epoch one 3-step
    # block (crossing {0}: save, NO exit) + one flushed single step
    # (crossing {3}: save + exit) -> exactly 4 executed steps, matching
    # the single-step path's exit after its step-3 save.
    big = synthetic.make_dataset_pair(
        str(tmp_path_factory.mktemp("ds_dtt")), "chi3d", num_clips=32
    )
    steps = {}
    for K in (1, 3):
        args = _train_args(
            tmp_path, big, steps_per_call=K, num_steps=40, save_interval=3,
            log_interval=100, save_dir=str(tmp_path / f"save_k{K}"),
        )
        loop = train_mdm.main(args)
        steps[K] = int(jax.device_get(loop.state["step"]))
    assert steps[1] == 4, steps
    assert steps[3] == 4, steps


def test_profiler_trace_capture(tmp_path, data_path):
    """--profile_steps captures a jax.profiler trace directory."""
    from regennet_tpu.train import train_mdm

    args = _train_args(tmp_path, data_path, num_steps=5, profile_steps=2,
                       profile_start=1)
    train_mdm.main(args)
    prof = os.path.join(args.save_dir, "profile")
    assert os.path.isdir(prof)
    # the trace writer creates plugins/profile/<run>/ with at least one file
    found = [f for _, _, fs in os.walk(prof) for f in fs]
    assert found, "no trace files written"


def test_fsdp_param_sharding_agrees_with_replicated(tmp_path, data_path):
    """--param_sharding fsdp (ZeRO-style sharding of params, EMA and AdamW
    moments over the 'data' axis — an extra over the reference's
    replicate-everything DDP) must actually shard the state and reproduce
    the replicated step's loss."""
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    # one fixed batch for both modes: fresh loader iterations consume the
    # ambient numpy RNG (window sampling), so per-loop batches would differ
    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=16, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx", loader_shuffle=False,
    )
    motion, cond = next(iter(data))

    def sharded_leaves(tree):
        return [
            leaf for leaf in jax.tree_util.tree_leaves(tree)
            if hasattr(leaf, "sharding")
            and any("data" in str(e) for e in (leaf.sharding.spec or ()))
        ]

    losses = {}
    for mode in ("replicated", "fsdp"):
        args = _train_args(
            tmp_path, data_path, param_sharding=mode, latent_dim=64,
            dropout=0.0, save_dir=str(tmp_path / f"save_{mode}"),
        )
        model, sched, cfg = create_model_and_diffusion(args, data)
        loop = TrainLoop(args, NoPlatform(args.save_dir), model, sched, cfg, data)

        if mode == "fsdp":
            assert sharded_leaves(loop.state["params"]), "params not sharded"
            assert sharded_leaves(loop.state["ema_params"]), "EMA not sharded"
            assert sharded_leaves(loop.state["opt_state"]), (
                "AdamW moments not sharded"
            )
        else:
            assert not sharded_leaves(loop.state["params"])

        m1 = loop.run_step(motion, cond)
        m2 = loop.run_step(motion, cond)  # second step exercises the moments
        losses[mode] = (float(m1["loss"]), float(m2["loss"]))
        # the step must preserve the fsdp placement (donation round-trip)
        if mode == "fsdp":
            assert sharded_leaves(loop.state["params"])
    # step 1 runs on bit-identical params: only collective reduction order
    # differs; step 2 compounds the adam update's amplification of it
    np.testing.assert_allclose(losses["fsdp"][0], losses["replicated"][0],
                               rtol=1e-4)
    np.testing.assert_allclose(losses["fsdp"][1], losses["replicated"][1],
                               rtol=5e-3)

def test_loss_aware_sampler_converges_with_steps_per_call(tmp_path, data_path):
    """--steps_per_call K with the loss-second-moment sampler: the block
    path draws all K timesteps from an importance distribution up to K-1
    updates stale (warned at TrainLoop init; run_block docstring). Pin that
    the warned combination still CONVERGES equivalently: same tiny model,
    same batch stream, K=1 vs K=8, importance sampling fully warmed up —
    both trajectories must descend and land in the same loss band.

    reference: diffusion/resample.py:60-104 (the sampler being staled);
    the reference itself has no fused-block path, so K=1 is its semantics.
    """
    from regennet_tpu.data.get_data import get_dataset_loader
    from regennet_tpu.train.train_platforms import NoPlatform
    from regennet_tpu.train.training_loop import TrainLoop
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    data = get_dataset_loader(
        name="chi3d", batch_size=8, num_frames=16, num_person=2,
        data_path=data_path, setting="cmdm", pose_rep="rot6d",
        body_model="smplx", loader_shuffle=False,
    )
    n_steps = 120  # warm-up needs 10 draws per each of the 20 timesteps
    batches = []
    while len(batches) < n_steps:
        for motion, cond in data:
            batches.append((motion, cond))
            if len(batches) == n_steps:
                break

    def train(steps_per_call, save_dir):
        args = _train_args(
            tmp_path, data_path, diffusion_steps=20, num_steps=n_steps,
            lambda_orient=0.0, lambda_body=0.0, lambda_transl=0.0,
            lambda_vel=0.0, log_interval=10_000, save_interval=10_000,
            steps_per_call=steps_per_call, save_dir=save_dir,
        )
        model, sched, cfg = create_model_and_diffusion(args, data)
        loop = TrainLoop(
            args, NoPlatform(args.save_dir), model, sched, cfg, data
        )
        losses = []
        if steps_per_call == 1:
            for m, c in batches:
                losses.append(float(loop.run_step(m, c)["loss"]))
        else:
            for i in range(0, n_steps, steps_per_call):
                block = batches[i : i + steps_per_call]
                losses.extend(
                    float(m["loss"]) for m in loop.run_block(block)
                )
        return losses, loop

    old = os.environ.get("REGENNET_SCHEDULE_SAMPLER")
    os.environ["REGENNET_SCHEDULE_SAMPLER"] = "loss-second-moment"
    try:
        losses_1, loop_1 = train(1, str(tmp_path / "save_k1"))
        losses_8, loop_8 = train(8, str(tmp_path / "save_k8"))
    finally:
        if old is None:
            os.environ.pop("REGENNET_SCHEDULE_SAMPLER", None)
        else:
            os.environ["REGENNET_SCHEDULE_SAMPLER"] = old

    # the importance distribution must actually have engaged (both paths
    # feed every step's losses back into the history)
    assert loop_1.schedule_sampler._warmed_up()
    assert loop_8.schedule_sampler._warmed_up()

    # both descend by a comfortable margin...
    tail_1 = float(np.mean(losses_1[-16:]))
    tail_8 = float(np.mean(losses_8[-16:]))
    head_1 = float(np.mean(losses_1[:5]))
    head_8 = float(np.mean(losses_8[:5]))
    assert tail_1 < head_1 * 0.7
    assert tail_8 < head_8 * 0.7
    # ...and land in the same band: the staleness is bounded (K-1 updates
    # of a slowly-moving second-moment history), not compounding
    assert abs(tail_8 - tail_1) < 0.35 * max(tail_1, tail_8)

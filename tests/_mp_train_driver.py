"""Subprocess driver for the 2-process distributed-runtime test
(tests/test_multiprocess.py). Each instance is one jax process with 4
virtual CPU devices; together they form the 8-device global mesh and run
`train_mdm.main` end-to-end — the reference's `mpiexec -n N` deployment
shape (reference: utils/dist_util.py:20-83, train/train_mdm.py:47-49).

Invoked as: python _mp_train_driver.py '<json cfg>'
Env contract (set by the parent test): JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID, REGENNET_SCHEDULE_SAMPLER,
DIFFUSION_TRAINING_TEST.

Prints one MP_DRIVER_RESULT json line on success; any assertion failure
exits nonzero.
"""

import json
import os
import sys


def main():
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    import numpy as np

    sys.path.insert(0, cfg["repo"])
    from argparse import Namespace

    from regennet_tpu.train import train_mdm

    args = Namespace(
        cuda=True, device=0, seed=10, batch_size=cfg["batch_size"],
        use_ddim=False, timestep_respacing="", noise_schedule="cosine",
        diffusion_steps=100, sigma_small=True,
        setting="cmdm", arch="online", emb_trans_dec=False, wo_pos_emb=False,
        cm_mode="concat", layers=2, latent_dim=32, cond_mask_prob=0.1,
        lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0, lambda_orient=0.0,
        lambda_body=0.0, lambda_transl=0.0, unconstrained=False,
        dataset="chi3d", data_dir="", num_person=2,
        data_path=cfg["data_path"], pose_rep="rot6d", body_model="smplx",
        vel_threshold=0.01, shuffle=False,
        save_dir=cfg["save_dir"], overwrite=True,
        train_platform_type="NoPlatform", lr=1e-3, weight_decay=0.0,
        lr_anneal_steps=0, eval_batch_size=32, eval_split="test",
        eval_during_training=False, eval_rep_times=3, eval_num_samples=1000,
        log_interval=100, save_interval=3, num_steps=40,
        num_frames=cfg["num_frames"], resume_checkpoint="",
        data_parallel=-1, tensor_parallel=1, compute_dtype="float32",
        # the shipped default path is fused K-step blocks; 2 here so the
        # multi-process runtime test covers the block path (stacked batch
        # sharding, per-step loss-aware updates, boundary saves) with the
        # 16-clip shard: len(data)=4 -> two full blocks per epoch
        steps_per_call=2,
    )

    # ---- run 1: fresh training (rendezvous happens inside main) ----------
    loop = train_mdm.main(args)

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    # dataset shard striding: each process holds every 2nd clip
    # (reference contract: feeder.py:91 `self._train[shard:][::num_shards]`)
    shard_len = len(loop.data.dataset)
    assert shard_len == cfg["num_clips"] // 2, shard_len

    # global batch accounting
    assert loop.global_batch == cfg["batch_size"] * 2, loop.global_batch

    # the jitted global batch really is [B*P, ...]: re-assemble one
    from regennet_tpu.parallel import mesh as mesh_lib

    motion, cond = next(iter(loop.data))
    dev_batch = loop._make_device_batch(motion, cond)
    assert dev_batch["motion"].shape[0] == cfg["batch_size"] * 2, (
        dev_batch["motion"].shape
    )
    # ...and concatenates the two DIFFERENT process shards (not a
    # misinterpreted local array): our local rows appear at our offset
    local = mesh_lib.host_local_slice(dev_batch["motion"], loop.mesh)
    np.testing.assert_allclose(local, np.asarray(motion), rtol=1e-6)

    # DIFFUSION_TRAINING_TEST stops at the first block whose save CROSSING
    # step is > 0: block [0,1] saves (step-0 crossing, no exit), block
    # [2,3] saves and exits -> 4 executed steps, same as the K=1 path
    final_step = int(jax.device_get(loop.state["step"]))
    assert final_step == 4, final_step

    # loss-second-moment sampler: one update per step, global_batch entries
    # each (allgathered across the 2 processes)
    counts = int(loop.schedule_sampler._loss_counts.sum())
    assert counts == 4 * loop.global_batch, counts

    # direct allgather semantics check: distinct per-process losses merge
    # into the same history on both processes
    from regennet_tpu.diffusion.resample import LossSecondMomentResampler

    rs = LossSecondMomentResampler(10)
    rs.update_with_local_losses(
        np.asarray([7]), np.asarray([1.0 + jax.process_index()])
    )
    got = sorted(rs._loss_history[7, :2].tolist())
    assert got == [1.0, 2.0], got
    assert int(rs._loss_counts[7]) == 2, rs._loss_counts[7]

    # ---- run 2: resume from the written checkpoint ------------------------
    loop2 = train_mdm.main(args)
    assert loop2.resume_step == 4, loop2.resume_step
    final_step2 = int(jax.device_get(loop2.state["step"]))
    assert final_step2 == 8, final_step2

    print("MP_DRIVER_RESULT " + json.dumps({
        "process_id": jax.process_index(),
        "shard_len": shard_len,
        "global_batch": loop.global_batch,
        "final_step": final_step,
        "resume_step": loop2.resume_step,
        "final_step2": final_step2,
    }), flush=True)


if __name__ == "__main__":
    main()

"""Training CLI — `python -m regennet_tpu.train.train_mdm`.

Mirrors the reference entry point (reference: train/train_mdm.py:18-62):
parse args -> fix seed -> platform -> save args.json -> data (sharded per
process) -> model + diffusion -> TrainLoop.run_loop().

Multi-host: launch one process per host with JAX_COORDINATOR_ADDRESS etc.;
`jax.distributed.initialize()` replaces the reference's MPI rendezvous, and
the host-side dataset shard striding keeps the reference's data split
contract (shard = process_index, num_shards = process_count).
"""

from __future__ import annotations

import json
import os

import jax

from regennet_tpu.data.get_data import get_dataset_loader
from regennet_tpu.parallel.mesh import process_shard_info
from regennet_tpu.train.train_platforms import get_platform
from regennet_tpu.train.training_loop import TrainLoop
from regennet_tpu.utils import kvlogger as logger
from regennet_tpu.utils import parser_util
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.model_util import create_model_and_diffusion


def maybe_init_distributed():
    """Rendezvous for multi-process launches (the reference's deployment
    shape is `mpiexec -n 4` — reference: utils/dist_util.py:20-42).

    On TPU pods `jax.distributed.initialize()` auto-detects everything; for
    manual launches (including the 2-process CPU test) JAX_NUM_PROCESSES /
    JAX_PROCESS_ID pin the rendezvous explicitly."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        if os.environ.get("JAX_NUM_PROCESSES") or \
                os.environ.get("JAX_PROCESS_ID"):
            # silently proceeding would make every process train as an
            # independent single-process world on its own shard stride
            raise RuntimeError(
                "JAX_NUM_PROCESSES/JAX_PROCESS_ID are set but "
                "JAX_COORDINATOR_ADDRESS is not; a manual multi-process "
                "launch must export all three"
            )
        return
    if jax.distributed.is_initialized():
        return
    if os.environ.get("JAX_NUM_PROCESSES"):
        process_id = os.environ.get("JAX_PROCESS_ID")
        if process_id is None:
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not; a "
                "manual multi-process launch must export both (plus "
                "JAX_COORDINATOR_ADDRESS) with a distinct id per process"
            )
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(process_id),
        )
    else:
        jax.distributed.initialize()


def main(args=None):
    if args is None:
        args = parser_util.train_args()
    maybe_init_distributed()
    fixseed(args.seed)

    train_platform = get_platform(args.train_platform_type)(args.save_dir)
    train_platform.report_args(args, name="Args")

    if args.save_dir is None:
        raise FileNotFoundError("save_dir was not specified.")
    if os.path.exists(args.save_dir) and not args.overwrite and \
            os.path.exists(os.path.join(args.save_dir, "args.json")):
        raise FileExistsError(
            f"save_dir [{args.save_dir}] already exists (use --overwrite)."
        )
    os.makedirs(args.save_dir, exist_ok=True)
    parser_util.save_args(args, args.save_dir)
    logger.configure(args.save_dir)

    shard, num_shards = process_shard_info()
    logger.log(f"creating data loader... (shard {shard}/{num_shards})")
    data = get_dataset_loader(
        name=args.dataset,
        batch_size=args.batch_size,
        num_frames=args.num_frames,
        num_person=args.num_person,
        data_path=args.data_path,
        setting=args.setting,
        pose_rep=args.pose_rep,
        body_model=args.body_model,
        shuffle=args.shuffle,
        shard=shard,
        num_shards=num_shards,
    )

    logger.log("creating model and diffusion...")
    model, sched, cfg = create_model_and_diffusion(args, data)

    logger.log("Training...")
    loop = TrainLoop(args, train_platform, model, sched, cfg, data)
    loop.run_loop()
    train_platform.close()
    return loop


if __name__ == "__main__":
    main()

"""regennet_tpu — a TPU-native (JAX/Flax/pjit/Pallas) framework for conditional
human action-reaction synthesis.

Re-designed from scratch with the capabilities of liangxuy/ReGenNet (CVPR 2024):
a conditional motion diffusion model (CMDM) that, given an "actor" person's
motion, synthesizes the "reactor" person's motion, online (causal) or offline,
with or without action conditioning.

Layer map (mirrors reference SURVEY.md §1, re-architected for TPU):
  ops/        geometry + SMPL/SMPL-X body models + fused LBS decode (L0)
  data/       h5 feeders, frame samplers, fixed-shape collate (L1)
  diffusion/  Gaussian diffusion schedules, scan-fused samplers, losses (L2)
  models/     Flax CMDM denoiser, CFG folding, ST-GCN evaluator (L3/L6)
  parallel/   device meshes + shardings (replaces MPI/NCCL DDP) (L4)
  train/      jitted train step, Orbax checkpointing, CLI (L5/L7)
  eval/       ST-GCN eval harness, FID/acc/div/multimod metrics (L6)
  sample/     conditional generation + inpainting CLIs (L7)
"""

__version__ = "0.1.0"

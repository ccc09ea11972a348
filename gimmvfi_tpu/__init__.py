"""gimmvfi_tpu — a TPU-native video frame interpolation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GIMM-VFI
(NeurIPS 2024): generalizable implicit motion modeling for arbitrary-timestep
video frame interpolation.

Layout (bottom-up):
  ops/       pure-function tensor ops: warping, resizing, forward splatting,
             correlation volumes (the reference's CUDA/CuPy kernels rebuilt
             as XLA/Pallas programs)
  nn/        small neural layers (convs in NHWC, PReLU, pixel-shuffle, norms)
  flow/      frozen optical-flow estimators (RAFT, FlowFormer)
  models/    GIMM motion INR + GIMM-VFI models + AMT-style synthesis
  data/      datasets, .flo/.png IO, augmentation
  train/     losses, optimizers, trainers, EMA, checkpointing
  parallel/  device mesh + sharding (data/spatial parallel)
  utils/     config, checkpoint conversion, flow visualization
  cli/       entry points (train, video_nx, benchmark harnesses)

All image tensors are channels-last (NHWC) — the TPU-native layout — in
contrast to the reference's NCHW.
"""

__version__ = "0.1.0"

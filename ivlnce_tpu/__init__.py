"""ivlnce_tpu — a TPU-native (JAX / XLA / Pallas) framework for Iterative
Vision-and-Language Navigation in Continuous Environments (IVLN-CE).

This is a ground-up redesign of the capabilities of jacobkrantz/IVLN-CE
(PyTorch + Habitat) for TPU hardware:

- All compute from raw frames onward (depth -> pointcloud -> semantic map,
  visual encoders, CMA-GRU policies) is JAX, jitted as a single step
  function with state carried in a pytree.
- The mapping hot path (voxel dedup / rasterize, reference:
  ivlnce_baselines/common/mapping_module/mapper.py) runs as Pallas
  scatter-max kernels with an XLA segment-max fallback.
- Simulators stay host-side behind a lane-batched vector-env protocol
  (reference: ivlnce_baselines/common/env_utils.py).
- Scaling is expressed with jax.sharding over a device Mesh (pjit /
  shard_map), not process-per-GPU.

Package layout:
    config/    yacs-compatible frozen config + experiment/task defaults
    ops/       geometry + Pallas kernels (scatter-max, rasterize)
    mapping/   functional semantic mapping module (jit-compatible state)
    models/    Flax policies and encoders + torch checkpoint converters
    envs/      iterative 7-tuple env protocol, vector env, fake sim
    tasks/     datasets, tour iterator, sensors, measures, tour-nDTW
    trainers/  teacher-forcing / DAgger / tour-BPTT trainers
    parallel/  device mesh + sharded train/eval steps
    utils/     registry, batching, logging
    native/    C++ runtime pieces (trajectory store, DTW) via ctypes
"""

__version__ = "0.1.0"

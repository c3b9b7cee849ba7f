"""PDM-SSD TPU: a TPU-native (JAX / XLA / Pallas / pjit) 3D point-cloud detection framework.

A ground-up rebuild of the capabilities of the PDM-SSD / OpenPCDet reference
(`/root/reference`), designed TPU-first:

- All raggedness is (data, mask) with static shapes; everything model-side runs under jit.
- Point ops (FPS / ball query / grouping / three-NN) are fixed-shape masked kernels with
  pure-JAX references and Pallas TPU implementations.
- Data parallelism is a `jax.sharding.Mesh` + NamedSharding, not DDP.
- Models are pure functions over pytrees (flax.linen), configured by the same YAML schema
  family as the reference (`pcdet/config.py`).
"""

__version__ = "0.1.0"

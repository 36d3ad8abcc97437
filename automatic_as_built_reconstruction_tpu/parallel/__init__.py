"""Parallelism: device meshes, sharded train/inference programs.

The reference has no distributed backend (single-GPU torch,
optional intra-process DataParallel) [ref: SURVEY.md §2.8].  Here the
TPU-native story: ``jax.sharding.Mesh`` + jit-with-shardings; XLA inserts
ICI collectives.  Data parallelism for training, batched pod inference for
serving (BASELINE.json config 5).
"""
from .mesh import data_parallel_mesh, replicate, shard_batch
from .inference import PodInference, pod_inference_from_checkpoint

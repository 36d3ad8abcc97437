"""AOT serving artifacts via ``jax.export`` (StableHLO).

Packages the full single-chip serving program — on-device voxelization
-> VFE -> middle -> RPN -> decode + rotated NMS, with the weights baked
in as constants — into one serialized, version-stable artifact that a
deployment host loads and calls without the model code, the config
system, or a checkpoint directory.  Cross-platform lowering means a
CPU-only build box can emit TPU artifacts (``platforms=("tpu",)``).

This is the TPU-native analog of the torch->TensorRT/ONNX deployment
exports common around the lineage (the reference itself serves from
python checkpoints [ref: second/pytorch/train.py evaluate — lineage-
expected]); here the artifact IS the compiled-from source, so serving
parity with ``evaluate`` is exact by construction.

Pod-scale serving replicates the artifact per chip and batch-shards on
the host (the in-process path with cross-chip sharding stays
``parallel.inference.PodInference``).
"""
from __future__ import annotations

import json
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"ABRSERVE1\n"


def export_serving(pod, batch: int, max_points: int,
                   num_features: int = 4,
                   platforms: Sequence[str] = ("tpu",)) -> bytes:
    """Serialize a :class:`~..parallel.inference.PodInference` program.

    Args:
        pod: a built PodInference (single-chip: ``mesh=None``).
        batch / max_points / num_features: the static serving shapes —
            points [batch, max_points, num_features] + num_valid [batch].
        platforms: lowering targets; any superset of the fleet works
            (e.g. ``("tpu", "cpu")`` for a host-testable artifact).

    Returns the artifact bytes (header + metadata + StableHLO payload).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if pod._mesh is not None:
        raise ValueError("export_serving packages the single-chip "
                         "program; shard batches across artifact "
                         "replicas (or use PodInference in-process)")
    variables = pod._variables

    def serve(points, num_valid):
        return pod._fn(variables, points, num_valid)

    args = (jax.ShapeDtypeStruct((batch, max_points, num_features),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.int32))
    exp = jexport.export(jax.jit(serve),
                         platforms=tuple(platforms))(*args)
    meta = json.dumps({
        "batch": batch, "max_points": max_points,
        "num_features": num_features, "platforms": list(platforms),
        "voxelization": pod._voxelization,
        "outputs": ["box3d_lidar", "scores", "label_preds", "valid"],
    }).encode()
    blob = exp.serialize()
    return _MAGIC + len(meta).to_bytes(4, "little") + meta + blob


class ServingArtifact:
    """A loaded artifact: ``artifact(points, num_valid) -> detections``."""

    def __init__(self, meta: Dict, exported):
        self.meta = meta
        self._exported = exported

    def __call__(self, points: np.ndarray,
                 num_valid: np.ndarray) -> Dict[str, np.ndarray]:
        import jax
        out = self._exported.call(points, num_valid)
        return jax.device_get(out)


def load_serving(blob: bytes) -> ServingArtifact:
    from jax import export as jexport

    if not blob.startswith(_MAGIC):
        raise ValueError("not an ABRSERVE1 artifact")
    off = len(_MAGIC)
    n = int.from_bytes(blob[off:off + 4], "little")
    meta = json.loads(blob[off + 4:off + 4 + n].decode())
    exp = jexport.deserialize(blob[off + 4 + n:])
    return ServingArtifact(meta, exp)


def export_serving_from_checkpoint(
        config_path, model_dir, output_path, *, batch: int = 8,
        max_points: int = 60000,
        platforms: Sequence[str] = ("tpu",),
        max_voxels: int = 20000, max_points_per_voxel: int = 32,
        voxelization: str = "hard") -> Tuple[int, Dict]:
    """Config + latest checkpoint -> artifact file.  Returns (bytes
    written, metadata)."""
    from ..parallel.inference import pod_inference_from_checkpoint

    pod = pod_inference_from_checkpoint(
        config_path, model_dir, max_voxels=max_voxels,
        max_points_per_voxel=max_points_per_voxel,
        voxelization=voxelization)
    blob = export_serving(pod, batch, max_points, platforms=platforms)
    with open(output_path, "wb") as f:
        f.write(blob)
    art = load_serving(blob)
    return len(blob), art.meta

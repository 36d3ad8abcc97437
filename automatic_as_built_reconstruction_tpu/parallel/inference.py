"""Batched pod inference (BASELINE.json config 5).

Whole-scan point buffers are batch-sharded over the ``data`` mesh axis;
each shard voxelizes its scans on device (hard or dynamic/cap-free
voxelization), runs the network, decodes, and NMS-es — one jit program,
XLA handles the cross-chip layout.  Scales to batch >= num_devices with
zero host-side resharding.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import voxelnet as voxelnet_mod
from ..ops import voxelize_jax


class PodInference:
    """jit-once, stream-batches pod inference for a built model."""

    def __init__(self, model, model_cfg, variables, anchors: np.ndarray,
                 mesh: Optional[Mesh] = None,
                 max_voxels: int = 20000, max_points_per_voxel: int = 32,
                 voxelization: str = "hard"):
        """voxelization: "hard" (FCFS caps, any VFE) or "dynamic"
        (cap-free per-voxel means — variable-density scans; pairs with the
        SimpleVoxel/mean VFE, which is the identity at T=1)."""
        assert voxelization in ("hard", "dynamic")
        self._model = model
        self._cfg = model_cfg
        self._mesh = mesh
        self._anchors = jnp.asarray(anchors)  # [A, 7]
        self._max_voxels = max_voxels
        self._max_ppv = max_points_per_voxel
        self._voxelization = voxelization
        if mesh is not None:
            self._variables = jax.device_put(
                variables, NamedSharding(mesh, P()))
        else:
            self._variables = variables
        self._fn = self._build()

    def _build(self):
        cfg = self._cfg

        def run(variables, points, num_valid):
            if self._voxelization == "dynamic":
                dv = jax.vmap(lambda p, n: voxelize_jax.dynamic_voxelize(
                    p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
                    grid_size=cfg.grid_size,
                    max_voxels=self._max_voxels))(points, num_valid)
                voxels = dv.features[:, :, None, :]       # [B, V, 1, C]
                num_points = jnp.minimum(dv.num_points, 1)
                coords = dv.coords
            else:
                vox = jax.vmap(lambda p, n: voxelize_jax.voxelize(
                    p, n, voxel_size=cfg.voxel_size, pc_range=cfg.pc_range,
                    grid_size=cfg.grid_size, max_points=self._max_ppv,
                    max_voxels=self._max_voxels,
                    first_appearance=False))(points, num_valid)
                voxels, num_points, coords = (vox.voxels, vox.num_points,
                                              vox.coords)
            preds = self._model.apply(variables, voxels, num_points,
                                      coords, train=False)
            anchors = jnp.broadcast_to(
                self._anchors, (points.shape[0],) + self._anchors.shape)
            return voxelnet_mod.predict(preds, anchors, cfg)

        if self._mesh is None:
            return jax.jit(run)
        data = NamedSharding(self._mesh, P("data"))
        repl = NamedSharding(self._mesh, P())
        return jax.jit(run, in_shardings=(repl, data, data),
                       out_shardings=data)

    def __call__(self, points: np.ndarray,
                 num_valid: np.ndarray) -> Dict[str, np.ndarray]:
        """points [B, P, C] padded, num_valid [B] -> detection dict
        (host numpy, padded with validity mask)."""
        if self._mesh is not None:
            data = NamedSharding(self._mesh, P("data"))
            points = jax.device_put(jnp.asarray(points), data)
            num_valid = jax.device_put(jnp.asarray(num_valid), data)
        out = self._fn(self._variables, points, num_valid)
        return jax.device_get(out)

    def detections_list(self, out: Dict[str, np.ndarray]):
        """Split a padded output dict into per-scan detection dicts."""
        dets = []
        for b in range(out["box3d_lidar"].shape[0]):
            v = out["valid"][b]
            dets.append({
                "box3d_lidar": out["box3d_lidar"][b][v],
                "scores": out["scores"][b][v],
                "label_preds": out["label_preds"][b][v],
            })
        return dets


def pod_inference_from_checkpoint(config_path, model_dir, *,
                                  mesh: Optional[Mesh] = None,
                                  max_voxels: int = 20000,
                                  max_points_per_voxel: int = 32,
                                  voxelization: str = "hard") -> PodInference:
    """Build a PodInference straight from a config + checkpoint dir.

    Loads the latest orbax checkpoint (or initializes fresh weights with a
    warning if none exists) and generates the anchor grid from the config's
    target assigner — the one-call serving entry point.
    """
    import numpy as np

    from ..train import checkpoint as ckpt_mod
    from ..train import train as train_mod

    bundle = train_mod.Bundle(config_path)
    state, _ = train_mod.init_state(bundle)
    restored, step = ckpt_mod.try_restore_latest(model_dir, state)
    if restored is not None:
        state = restored
        print(f"pod inference: loaded checkpoint at step {step}")
    else:
        print("WARNING: no checkpoint found; serving random weights")
    anchors = bundle.target_assigner.generate_anchors(
        bundle.feature_map_size)["anchors"].reshape(-1, 7).astype(np.float32)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    return PodInference(bundle.model, bundle.model_cfg, variables, anchors,
                        mesh=mesh, max_voxels=max_voxels,
                        max_points_per_voxel=max_points_per_voxel,
                        voxelization=voxelization)

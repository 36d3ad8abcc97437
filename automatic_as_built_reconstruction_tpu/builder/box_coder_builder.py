"""BoxCoder proto -> core.box_coders coder."""
from __future__ import annotations

from ..core import box_coders
from ..protos import box_coder_pb2


def build(cfg: "box_coder_pb2.BoxCoder") -> box_coders.BoxCoder:
    which = cfg.WhichOneof("box_coder_oneof")
    if which == "ground_box3d_coder" or which is None:
        c = cfg.ground_box3d_coder
        return box_coders.GroundBox3dCoder(
            linear_dim=c.linear_dim, vec_encode=c.encode_angle_vector)
    if which == "bev_box_coder":
        c = cfg.bev_box_coder
        return box_coders.BevBoxCoder(
            linear_dim=c.linear_dim, vec_encode=c.encode_angle_vector,
            z_fixed=c.z_fixed, h_fixed=c.h_fixed)
    raise ValueError(f"unknown box coder {which}")

"""Config file IO: text-format protobuf <-> TrainEvalPipelineConfig."""
from __future__ import annotations

from pathlib import Path

from google.protobuf import text_format

from ..protos import pipeline_pb2


def load_config(path) -> "pipeline_pb2.TrainEvalPipelineConfig":
    cfg = pipeline_pb2.TrainEvalPipelineConfig()
    text_format.Parse(Path(path).read_text(), cfg)
    return cfg


def save_config(cfg, path) -> None:
    Path(path).write_text(text_format.MessageToString(cfg))

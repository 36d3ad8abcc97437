"""Protobuf config schema — mirrors the reference's config surface so
text-format ``.config`` experiment files parse directly.

Generated ``*_pb2.py`` are checked in (regenerate with ``make protos`` /
``protoc --python_out=. -I. *.proto`` + relative-import fixup).

[ref: second/protos/*.proto — lineage-expected schema, UNVERIFIED]
"""
from . import pipeline_pb2  # noqa: F401

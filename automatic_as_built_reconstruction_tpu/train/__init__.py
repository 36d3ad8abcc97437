"""Train/eval runtime: checkpointing, input pipeline, step loops, CLI glue.

[ref: second/pytorch/train.py + torchplus/train/ — lineage-expected,
UNVERIFIED]
"""

"""Data pipeline: dataset registry, adapters, fused sample prep, batching.

[ref: second/data/ — lineage-expected, UNVERIFIED (SURVEY.md §0)]
"""
from .dataset import Dataset, get_dataset_class, register_dataset

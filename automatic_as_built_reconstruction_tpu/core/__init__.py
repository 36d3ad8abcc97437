"""Framework-free numeric core (NumPy only; no jax/torch imports).

Host-side math shared by the data pipeline, target assignment, augmentation
and the KITTI eval harness, and the parity oracles for every device kernel in
``ops``.  [ref: second/core/ — lineage-expected, mount empty (SURVEY.md §0)]
"""

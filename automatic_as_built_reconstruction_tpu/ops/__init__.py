"""Device ops (JAX/XLA/Pallas) — the TPU compute path.

Every op here has a NumPy oracle in ``core`` and a parity test in
``tests/``.  Static shapes throughout: capacities + validity masks, never
data-dependent shapes (XLA requirement).
"""

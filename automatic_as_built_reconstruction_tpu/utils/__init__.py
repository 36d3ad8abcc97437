"""Utilities: eval harness, config tooling, timers, progress."""

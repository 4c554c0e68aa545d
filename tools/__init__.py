"""Operational tooling (sweeps, probes, the driver simulator). A package so
bench.py can import registry_sweep.sweep_ops for the per-round tail sweep."""

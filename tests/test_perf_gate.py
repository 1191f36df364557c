"""Perf regression gate as a test. Skips on the CPU suite (the floors in
perf_floors.json are real-chip numbers); on a TPU-backed pytest run it
fails if a shipped default hot path regressed below tolerance*floor.

    JAX_PLATFORMS= JAX_PLATFORM_NAME= python -m pytest tests/test_perf_gate.py -q

(Unsetting the platform vars overrides conftest's CPU forcing.)
Standalone equivalent: python scripts/perf_gate.py
"""

import os
import sys

import jax
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "scripts"))


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="perf floors are real-chip numbers")
def test_shipped_hot_paths_meet_perf_floors():
    import perf_gate

    ok, results = perf_gate.run_gate(quick=True)
    failing = {k: (round(v[0], 2), v[1]) for k, v in results.items()
               if not v[2]}
    assert ok, f"hot-path perf regression (measured, floor): {failing}"

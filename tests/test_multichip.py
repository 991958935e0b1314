"""The driver-checked multi-device gate, run as a pytest every round.

Runs the FULL sharded train step (data-parallel mesh, real in-step
collectives) on the 8-virtual-device CPU backend that conftest.py
forces. Mirrors reference DDP semantics
(/root/reference/tools/train.py:51-54).
"""
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert jax.device_count() >= 8, 'conftest must provide 8 CPU devices'
    import __graft_entry__ as g
    # In-process path: conftest already forced an 8-device CPU backend,
    # so no subprocess re-exec happens here.
    g.dryrun_multichip(8)

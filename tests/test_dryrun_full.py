"""Opt-in full-architecture multi-chip dryrun (VERDICT r3 #1).

The driver-facing ``dryrun_multichip`` defaults to the tiny recipe so
it fits the driver's time budget on a 1-CPU virtual mesh; the
full-architecture R50 variant (real 30k/40k voxel budgets, BEV 128x128
head grid) lives here instead, gated behind the ``slow`` marker AND
``DRYRUN_FULL=1`` — it needs many minutes of XLA:CPU compile time cold.

Run with::

    DRYRUN_FULL=1 python -m pytest tests/test_dryrun_full.py -m slow -q
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("DRYRUN_FULL") != "1",
                    reason="set DRYRUN_FULL=1 to run the full-arch "
                           "multi-chip dryrun (minutes of compile)")
def test_dryrun_full_architecture():
    import __graft_entry__ as g
    # conftest already switched this process to the 8-device virtual
    # CPU platform, so the impl runs in-process (no subprocess re-exec)
    g._dryrun_impl(8)

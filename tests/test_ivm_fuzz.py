"""One seeded round of the randomized IVM convergence sweep as a
regression net — the full multi-seed version is ``tools/ivm_fuzz.py``
(4 seeds x 5 steps x 12 plans run green as the round-5 adversarial
evidence); one seed here keeps suite time bounded while still driving
every maintained view kind through a random commit script."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

pytestmark = pytest.mark.slow  # randomized soak: explicit-run only (pytest -m slow)


def test_ivm_fuzz_one_seed(spark, scratch):
    from ivm_fuzz import run_seed

    run_seed(spark, seed=3, steps=3, root=scratch)

"""CI wrapper for the warmup-ladder coverage sweep (VERDICT r4 #6).

The full sweep (every counted-rep pattern in the conformance suite ×
an excursion-maximizing corpus) is `python tests/ladder_sweep.py`
(~1 h on the CPU mesh); CI runs a seeded 8-pattern sample each time —
over runs the whole corpus rotates through.  Any counterexample is a
ladder or φ-tier bug, not a flaky test: the claim is that EVERY
parser-accepted counted-rep product converges to bounded repairs.
"""

import ladder_sweep


def test_ladder_sweep_sample():
    fails = ladder_sweep.run(limit=8, seed=13, verbose=False)
    assert not fails, fails

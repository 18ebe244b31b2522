"""High-dimensional evidence accuracy: the reference's headline claim of
<=1% multimodal-integration error in up to 30-40 dimensions
(``/root/reference/doc/abstract.txt:6-10``), exercised through the full
MCMC -> R-grouping -> VB -> IS -> weighted-VB -> IS -> combine pipeline at
D=20 with a reduced sample budget (CPU, ~1-2 min).  The production-scale
D=20/40 float32 runs live in ``benchmarks/accuracy_highdim.py`` with
measured numbers in BENCHMARKS.md."""

import pytest

from benchmarks.accuracy_highdim import run_pipeline


@pytest.mark.slow
def test_evidence_within_one_percent_d20():
    result = run_pipeline(
        20, n_chains=16, mcmc_steps=300, mcmc_cycles=12, thin=5,
        n_is1=1 << 17, n_is2=1 << 19, seed=2024, verbose=False)
    assert result["abs_error_pct"] < 1.0, result
    assert result["ess"] > 0.1, result

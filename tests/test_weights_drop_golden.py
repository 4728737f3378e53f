"""The weights-drop golden (checkpoint dir -> GQA-format scores) must run
the full chain hermetically (VERDICT r2 item 9)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest as _pytest

pytestmark = _pytest.mark.slow

REPO = Path(__file__).parent.parent


def test_weights_drop_golden_chain(tmp_path):
    _pytest.importorskip("torch")
    _pytest.importorskip("tokenizers")
    out = subprocess.run(
        [sys.executable, str(REPO / "run" / "weights_drop_check.py"),
         "--work-dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["format_ok"] and result["answered"] == result["questions"]
    preds = json.load(open(result["predictions"]))
    assert {p["questionId"] for p in preds} == {"q0", "q1", "q2", "q3"}

"""Driver-protocol contract for bench.py (no accelerator needed).

The driver captures bench.py's stdout tail and parses the LAST bare JSON
line as the round's performance record; a driver timeout delivers SIGTERM.
These tests pin the two properties that protocol depends on:

  * the arm table is well-formed (every ordered arm resolves, every side
    spec carries the full key set — guards arm additions like 13b_int4);
  * SIGTERM always leaves a complete, parseable summary as the last line,
    even when it lands mid-print of the main loop's own summary (observed
    once in a real driver kill: two summaries fused onto one stdout line).
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIDE_KEYS = {"model", "batch", "new_tokens", "text_len", "quant",
             "cache_dtype", "spec_k"}


def _import_bench():
    sys.path.insert(0, REPO)
    import bench

    return bench


def test_arm_table_schema():
    bench = _import_bench()
    # default pass runs ARM_ORDER; EXTRA_ARMS are the opt-in (BENCH_EXTRA=1)
    # low-priority arms — together they must cover the table exactly
    assert set(bench.ARM_ORDER) | set(bench.EXTRA_ARMS) == set(bench.ARMS)
    assert not set(bench.ARM_ORDER) & set(bench.EXTRA_ARMS)
    for name, arm in bench.ARMS.items():
        assert arm["metric"].startswith(("decode_tok_s", "serving_decode")), name
        if "external" in arm:  # one-harness arms (7b_continuous)
            assert arm["external"][0].startswith("run/"), name
            continue
        assert set(arm["sparse"]) == SIDE_KEYS, name
        assert set(arm["dense"]) == SIDE_KEYS, name
        assert arm["sparse"]["model"] in ("7b", "13b", "1b", "small"), name
    # headline stays first: the summary's top-line metric is the first
    # COMPLETED arm in order, and the driver reads that as the round result
    assert bench.ARM_ORDER[0] == "7b_best"


def test_sigterm_mid_print_leaves_parseable_last_line():
    # Child: build a _FullRun with one completed arm, start writing a
    # summary line WITHOUT its newline, then deliver SIGTERM to self —
    # exactly the interleave a driver-timeout kill produced once.
    script = textwrap.dedent(
        """
        import os, signal, sys
        sys.path.insert(0, {repo!r})
        import bench

        run = bench._FullRun(60.0)
        run.detail["7b_best"] = {{
            "config": {{}},
            "sparse": {{"decode_tok_s": 123.0}},
            "dense": {{"decode_tok_s": 100.0}},
            "decode_speedup": 1.23,
        }}
        sys.stdout.write('{{"metric": "decode_tok_s_sparse_7b_int8_b24')
        sys.stdout.flush()
        os.kill(os.getpid(), signal.SIGTERM)
        """
    ).format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    summary = json.loads(lines[-1])  # must parse standalone
    assert summary["vs_baseline"] == 1.23
    assert summary["value"] == 123.0
    assert summary["metric"] == "decode_tok_s_sparse_7b_int8_b24_vs_dense_b8"


def test_run_side_budget_floor_raises_budget_exhausted():
    # With under ~2 min of budget left, launching a side subprocess can
    # only end in a clamped timeout; run_side must classify that as budget
    # exhaustion (skip) rather than an arm error (r4 sim logged errors:1
    # for exactly this case).
    import pytest

    bench = _import_bench()
    run = bench._FullRun(100.0, handle_signals=False)
    spec = {"model": "small", "batch": 1, "new_tokens": 8, "text_len": 8,
            "quant": None, "cache_dtype": None, "spec_k": None}
    with pytest.raises(bench._BudgetExhausted):
        run.run_side(spec, "sparse")


def test_run_arm_records_budget_exhaustion_as_skip(monkeypatch, tmp_path):
    bench = _import_bench()
    monkeypatch.chdir(tmp_path)  # emit_summary writes ./bench_detail.json
    run = bench._FullRun(600.0, handle_signals=False)

    def _exhausted(spec, which):
        raise bench._BudgetExhausted("wall-clock budget exhausted")

    monkeypatch.setattr(run, "run_side", _exhausted)
    run.run_arm("7b_batch")
    rec = run.detail["7b_batch"]
    assert "skipped" in rec
    assert "error" not in rec
    # and the summary therefore reports zero errors
    run.emit_summary()
    assert json.loads((tmp_path / "bench_detail.json").read_text())[
        "summary"]["errors"] == 0


def test_sigterm_with_nothing_completed_reports_incomplete():
    script = textwrap.dedent(
        """
        import os, signal, sys
        sys.path.insert(0, {repo!r})
        import bench

        run = bench._FullRun(60.0)
        os.kill(os.getpid(), signal.SIGTERM)
        """
    ).format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    summary = json.loads(lines[-1])
    assert summary["metric"] == "bench_incomplete"
    assert summary["vs_baseline"] == 0.0

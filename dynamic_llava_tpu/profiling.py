"""Device-memory accounting and timing helpers.

TPU rebuild of the reference's CUDA measurement protocol
(/root/reference/llava/dynamic_eval/bench_test/dynamic_llava_image_time_and_mem.py:59-66,153-156
``max_memory_allocated`` peak-minus-model split, and
model_lvis_for_ppl.py:165-181 cache-length trajectories).

``device.memory_stats()`` returns None over the axon TPU tunnel, so the
measured numbers here come from two honest sources that always work:

* **live-buffer accounting** — the sum of bytes of every live ``jax.Array``
  resident on the device (weights, KV cache, generation state). This is
  what the allocator must hold *between* program launches.
* **XLA memory analysis** — per compiled program, XLA's own accounting of
  argument/output/temp/alias bytes. ``temp`` is the scratch high-water the
  program adds on top of the live buffers while it runs.

``peak estimate = live bytes + max(program temp bytes)`` — an upper bound
that matches the reference's "peak" semantics (weights + persistent state +
transient workspace). When real ``memory_stats()`` are available (some
backends), they are reported too and take precedence for peak.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax

GB = float(1 << 30)


def device_memory_stats(device=None) -> Dict[str, int]:
    """Raw backend memory stats, or {} when the backend exposes none
    (the axon tunnel returns None)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return {}
    return dict(stats) if stats else {}


def live_device_bytes(device=None) -> int:
    """Total bytes of live jax.Arrays resident on ``device``."""
    d = device or jax.devices()[0]
    total = 0
    for a in jax.live_arrays():
        try:
            if d in a.devices():
                # sharded arrays: count only this device's shard
                n_dev = len(a.devices())
                total += a.nbytes // max(n_dev, 1)
        except Exception:
            continue
    return total


def tree_bytes(tree: Any) -> int:
    """Bytes of a pytree of arrays (e.g. the param tree = "model memory")."""
    leaves = jax.tree.leaves(tree)
    return sum(getattr(l, "nbytes", 0) for l in leaves)


def program_memory(compiled) -> Dict[str, int]:
    """XLA memory analysis of a compiled program (argument/output/temp/alias
    bytes). Works for ``jax.jit(f).lower(*args).compile()`` objects and for
    already-called jitted functions via ``f.lower(*args).compile()``."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return {}
    out = {}
    for k in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    return out


def memory_report(
    device=None,
    model_params: Any = None,
    compiled_programs: Optional[Dict[str, Any]] = None,
) -> Dict[str, float]:
    """One measured snapshot in GB, reference peak-minus-model split.

    ``compiled_programs`` maps name -> compiled object; the largest temp
    among them is the transient workspace added to the live high-water.
    """
    stats = device_memory_stats(device)
    live = live_device_bytes(device)
    report: Dict[str, float] = {
        "live_bytes_gb": round(live / GB, 4),
    }
    if model_params is not None:
        model = tree_bytes(model_params)
        report["model_bytes_gb"] = round(model / GB, 4)
        report["non_model_live_gb"] = round((live - model) / GB, 4)
    max_temp = 0
    if compiled_programs:
        progs = {}
        for name, c in compiled_programs.items():
            pm = program_memory(c)
            if pm:
                progs[name] = {k: round(v / GB, 4) for k, v in pm.items()}
                max_temp = max(max_temp, pm.get("temp_size_in_bytes", 0))
        if progs:
            report["programs_gb"] = progs
    report["peak_est_gb"] = round((live + max_temp) / GB, 4)
    if stats:
        report["bytes_in_use_gb"] = round(stats.get("bytes_in_use", 0) / GB, 4)
        report["peak_bytes_gb"] = round(
            stats.get("peak_bytes_in_use", 0) / GB, 4
        )
    return report

"""sglang_worker (native continuous micro-batching): concurrent requests
must batch into ONE padded generate, stream per chunk, and match solo runs
token-for-token; registration/heartbeat follow the controller protocol
(VERDICT r2 item 7 — the substitution for the reference's SGLang runtime,
/root/reference/llava/serve/sglang_worker.py:59)."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import json
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker(tmp_path_factory):
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from helpers import make_tiny_checkpoint

    from dynamic_llava_tpu.serve.sglang_worker import BatchedWorker

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("sglang") / "ckpt")
    )
    return BatchedWorker(
        ckpt, max_batch=8, batch_window_ms=200, decode_chunk=4,
        model_name="tiny-dynamic-llava",
    )


def _collect(worker, params):
    """Run one request through generate_stream_gate on a thread."""
    chunks = []
    done = threading.Event()

    def run():
        for c in worker.generate_stream_gate(params):
            chunks.append(json.loads(c.rstrip(b"\0")))
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return chunks, done


def test_concurrent_requests_micro_batch_and_match_solo(worker):
    prompts = [
        "USER : What is in the image ? ASSISTANT :",
        "USER : Is there a dog ? ASSISTANT :",
        "USER : describe briefly ASSISTANT :",
    ]
    max_new = 12

    # solo references first (each its own batch)
    solo_texts = []
    for p in prompts:
        chunks, done = _collect(worker, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": max_new,
        })
        assert done.wait(120)
        assert chunks and all(c["error_code"] == 0 for c in chunks)
        solo_texts.append(chunks[-1]["text"])
        assert worker.last_batch_size == 1

    # now submit all three inside one batch window
    streams = [
        _collect(worker, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": max_new,
        })
        for p in prompts
    ]
    for chunks, done in streams:
        assert done.wait(120)
    # all three rode ONE micro-batched generate
    assert worker.last_batch_size == 3
    for (chunks, _), solo in zip(streams, solo_texts):
        assert all(c["error_code"] == 0 for c in chunks)
        # streamed: intermediate chunks before the final one (decode_chunk=4
        # over 12 tokens), each a prefix-consistent accumulated text
        assert len(chunks) >= 2
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt["text"].startswith(prev["text"][: len(nxt["text"])]) or \
                len(prev["text"]) <= len(nxt["text"])
        # batched output matches the solo run token-for-token
        assert chunks[-1]["text"] == solo


def test_speculative_micro_batch_matches_plain(worker, tmp_path_factory):
    """A spec_k worker's micro-batched greedy outputs equal the plain
    worker's — ragged per-sample acceptance must not leak across the
    batch (same checkpoint, same prompts)."""
    from helpers import make_tiny_checkpoint

    from dynamic_llava_tpu.serve.sglang_worker import BatchedWorker

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("sglang_spec") / "ckpt")
    )
    spec = BatchedWorker(
        ckpt, max_batch=8, batch_window_ms=200, decode_chunk=4,
        model_name="tiny-dynamic-llava", spec_k=3,
    )
    prompts = [
        "USER : What is in the image ? ASSISTANT :",
        "USER : Is there a dog ? ASSISTANT :",
    ]
    # plain references from the module-scope worker (identical weights:
    # make_tiny_checkpoint is deterministic, torch.manual_seed(0))
    refs = []
    for p in prompts:
        chunks, done = _collect(worker, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": 12,
        })
        assert done.wait(120)
        refs.append(chunks[-1]["text"])

    streams = [
        _collect(spec, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": 12,
        })
        for p in prompts
    ]
    for (chunks, done), ref in zip(streams, refs):
        assert done.wait(120)
        assert all(c["error_code"] == 0 for c in chunks)
        assert chunks[-1]["text"] == ref
    assert spec.last_batch_size == 2  # both rode one speculative batch


def test_mixed_temperature_requests_split_batches(worker):
    """Requests with different temperatures must not share a batch."""
    p = "USER : hello world ASSISTANT :"
    streams = [
        _collect(worker, {"prompt": p, "temperature": t,
                          "max_new_tokens": 4})
        for t in (0.0, 0.0, 0.7)
    ]
    for chunks, done in streams:
        assert done.wait(120)
    # the last processed batch can only have held one of the two configs
    assert worker.last_batch_size in (1, 2)


def test_status_and_registration_heartbeat(worker):
    requests = pytest.importorskip("requests")
    from dynamic_llava_tpu.serve.controller import Controller
    from dynamic_llava_tpu.serve.http_compat import controller_stdlib_app

    status = worker.get_status()
    assert status["model_names"] == ["tiny-dynamic-llava"]

    cport = _free_port()
    ctrl = Controller("shortest_queue")
    csrv = controller_stdlib_app(ctrl, "127.0.0.1", cport)
    csrv.serve(background=True)
    time.sleep(0.2)

    worker.controller_addr = f"http://127.0.0.1:{cport}"
    worker.worker_addr = "http://127.0.0.1:59999"  # no live server needed
    worker.register_to_controller()
    models = requests.post(
        worker.controller_addr + "/list_models").json()["models"]
    assert "tiny-dynamic-llava" in models
    # heartbeat round-trip: controller knows the worker -> exist=True path
    worker.send_heart_beat()
    addr = requests.post(
        worker.controller_addr + "/get_worker_address",
        json={"model": "tiny-dynamic-llava"},
    ).json()["address"]
    assert addr == worker.worker_addr


def test_error_chunk_on_bad_request(worker):
    """A request the batch loop cannot process yields the protocol error
    chunk, not a hang."""
    chunks, done = _collect(worker, {
        "prompt": "USER : hi ASSISTANT :",
        "images": ["!!!not-base64-image!!!"],
        "temperature": 0.0, "max_new_tokens": 4,
    })
    assert done.wait(120)
    assert chunks and chunks[-1]["error_code"] == 1


def test_continuous_worker_matches_window_worker(worker, tmp_path_factory):
    """--continuous mode: requests admitted into the running slot batch
    stream the same greedy text the window-batched worker produces
    (identical deterministic checkpoint), a late request joins while the
    first is mid-flight, and sampled requests stream alongside greedy
    ones (per-slot temperature/top_p)."""
    from helpers import make_tiny_checkpoint

    from dynamic_llava_tpu.serve.sglang_worker import BatchedWorker

    ckpt = make_tiny_checkpoint(
        str(tmp_path_factory.mktemp("sglang_cont") / "ckpt")
    )
    cont = BatchedWorker(
        ckpt, batch_window_ms=50, decode_chunk=4,
        model_name="tiny-dynamic-llava",
        continuous=True, slots=2, prompt_bucket=32, max_new_cap=12,
    )
    prompts = [
        "USER : What is in the image ? ASSISTANT :",
        "USER : Is there a dog ? ASSISTANT :",
        "USER : describe briefly ASSISTANT :",
    ]
    refs = []
    for p in prompts:
        chunks, done = _collect(worker, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": 12,
        })
        assert done.wait(120)
        refs.append(chunks[-1]["text"])

    # 3 requests onto 2 slots: the third must wait for a retirement and
    # join the RUNNING batch (no global drain between them)
    streams = [
        _collect(cont, {
            "prompt": p, "temperature": 0.0, "max_new_tokens": 12,
        })
        for p in prompts
    ]
    for (chunks, done), ref in zip(streams, refs):
        assert done.wait(180)
        assert all(c["error_code"] == 0 for c in chunks)
        for prev, nxt in zip(chunks, chunks[1:]):
            assert nxt["text"].startswith(prev["text"][: len(nxt["text"])]) or \
                len(prev["text"]) <= len(nxt["text"])
        assert chunks[-1]["text"] == ref
    assert cont.last_batch_size <= 2  # never more than the slot count

    # sampled requests ride the same slot batch (per-slot sampling)
    chunks, done = _collect(cont, {
        "prompt": prompts[0], "temperature": 0.7, "top_p": 0.9,
        "max_new_tokens": 4,
    })
    assert done.wait(60)
    assert all(c["error_code"] == 0 for c in chunks)
    assert isinstance(chunks[-1]["text"], str) and chunks[-1]["text"]

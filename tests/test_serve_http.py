"""Serving stack over real HTTP (stdlib servers) as a regression test."""

import pytest as _pytest

pytestmark = _pytest.mark.slow


import json
import socket
import sys
import time
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

requests = pytest.importorskip("requests")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class _EchoWorker:
    """Minimal worker implementing the generate_stream_gate contract."""

    def get_status(self):
        return {"model_names": ["echo"], "speed": 1, "queue_length": 0}

    def generate_stream_gate(self, params):
        text = params["prompt"]
        for i in range(3):
            yield json.dumps(
                {"text": text + " +" * (i + 1), "error_code": 0}
            ).encode() + b"\0"


def test_controller_worker_round_trip():
    from dynamic_llava_tpu.serve.controller import Controller
    from dynamic_llava_tpu.serve.http_compat import (
        controller_stdlib_app,
        worker_stdlib_app,
    )

    cport, wport = _free_port(), _free_port()
    ctrl = Controller("shortest_queue")
    csrv = controller_stdlib_app(ctrl, "127.0.0.1", cport)
    csrv.serve(background=True)
    wsrv = worker_stdlib_app(_EchoWorker(), "127.0.0.1", wport)
    wsrv.serve(background=True)
    time.sleep(0.3)

    base = f"http://127.0.0.1:{cport}"
    worker_addr = f"http://127.0.0.1:{wport}"
    r = requests.post(base + "/register_worker", json={
        "worker_name": worker_addr, "check_heart_beat": True,
        "worker_status": None,
    })
    assert r.status_code == 200
    assert requests.post(base + "/list_models").json()["models"] == ["echo"]
    addr = requests.post(base + "/get_worker_address",
                         json={"model": "echo"}).json()["address"]
    assert addr == worker_addr

    resp = requests.post(base + "/worker_generate_stream",
                         json={"model": "echo", "prompt": "hi"},
                         stream=True, timeout=30)
    chunks = [json.loads(c.decode()) for c in
              resp.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    assert len(chunks) == 3
    assert chunks[-1]["text"] == "hi + + +"
    assert all(c["error_code"] == 0 for c in chunks)

    # unknown model -> controller emits the error chunk
    resp = requests.post(base + "/worker_generate_stream",
                         json={"model": "nope", "prompt": "x"},
                         stream=True, timeout=30)
    err = [json.loads(c.decode()) for c in
           resp.iter_lines(decode_unicode=False, delimiter=b"\0") if c]
    assert err[0]["error_code"] == 2

    # heartbeat keeps the worker registered
    hb = requests.post(base + "/receive_heart_beat", json={
        "worker_name": worker_addr, "queue_length": 1,
    }).json()
    assert hb["exist"]

    csrv.shutdown()
    wsrv.shutdown()


def test_model_worker_streams_fast_decode_path(tmp_path):
    """The worker's generate_stream must ride the same chunked on-device
    decode as Generator.generate — verified by exact greedy-text equality
    (VERDICT r1 #4: the shipped path must be the benchmarked path)."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    import base64
    from io import BytesIO

    from helpers import make_tiny_checkpoint
    from PIL import Image

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))

    from dynamic_llava_tpu.serve.model_worker import ModelWorker

    w = ModelWorker(
        controller_addr="", worker_addr="", worker_id="t0", no_register=True,
        model_path=ckpt, model_base=None, model_name="tiny-dynamic-llava",
    )
    arr = np.random.default_rng(0).integers(0, 255, (48, 48, 3)).astype("uint8")
    buf = BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    img64 = base64.b64encode(buf.getvalue()).decode()
    prompt = "USER : <image> What is in the image ? ASSISTANT :"
    max_new = 12

    chunks = list(w.generate_stream({
        "prompt": prompt, "images": [img64],
        "temperature": 0.0, "max_new_tokens": max_new,
    }))
    msgs = [json.loads(c.rstrip(b"\0")) for c in chunks]
    assert msgs and all(m["error_code"] == 0 for m in msgs)
    assert all(m["text"].startswith(prompt) for m in msgs)
    worker_text = msgs[-1]["text"][len(prompt):]

    # the worker cached a Generator: same instance = same compiled programs
    assert (0.0, 1.0) in w._generators

    # reference: the plain Generator fast path on identical inputs
    from dynamic_llava_tpu.generation.generate import (
        GenerationConfig,
        Generator,
    )
    from dynamic_llava_tpu.mm_utils import process_images, tokenizer_image_token

    ids = np.asarray(tokenizer_image_token(prompt, w.tokenizer), np.int64)
    pixels = process_images(
        [Image.fromarray(arr)], w.image_processor, w.runtime.cfg
    )
    gen = Generator(
        w.runtime.params, w.runtime.cfg,
        GenerationConfig(
            max_new_tokens=max_new, temperature=0.0,
            eos_token_id=w.tokenizer.eos_token_id,
        ),
    )
    out = gen.generate([ids], pixels)[0]
    if out and out[-1] == w.tokenizer.eos_token_id:
        out = out[:-1]
    ref_text = w.tokenizer.decode(out, skip_special_tokens=True)
    assert worker_text == ref_text


def test_model_worker_ring_kv_flags(tmp_path):
    """--kv-overflow ring --kv-window N must flow into the worker's cached
    Generators: its stream matches a ring-configured Generator exactly."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from helpers import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))

    from dynamic_llava_tpu.serve.model_worker import ModelWorker

    w = ModelWorker(
        controller_addr="", worker_addr="", worker_id="t1", no_register=True,
        model_path=ckpt, model_base=None, model_name="tiny-dynamic-llava",
        kv_overflow="ring", kv_window=8,
    )
    prompt = "USER : Say hello . ASSISTANT :"
    max_new = 24  # >> window: the ring wraps mid-stream
    chunks = list(w.generate_stream({
        "prompt": prompt, "temperature": 0.0, "max_new_tokens": max_new,
    }))
    msgs = [json.loads(c.rstrip(b"\0")) for c in chunks]
    assert msgs and all(m["error_code"] == 0 for m in msgs)
    worker_text = msgs[-1]["text"][len(prompt):]

    gen_cfg = w._generators[(0.0, 1.0)].gen_cfg
    assert gen_cfg.kv_overflow == "ring" and gen_cfg.kv_window == 8

    from dynamic_llava_tpu.generation.generate import (
        GenerationConfig,
        Generator,
    )
    from dynamic_llava_tpu.mm_utils import tokenizer_image_token

    ids = np.asarray(tokenizer_image_token(prompt, w.tokenizer), np.int64)
    gen = Generator(
        w.runtime.params, w.runtime.cfg,
        GenerationConfig(
            max_new_tokens=max_new, temperature=0.0,
            eos_token_id=w.tokenizer.eos_token_id,
            kv_overflow="ring", kv_window=8,
        ),
    )
    out = gen.generate([ids])[0]
    if out and out[-1] == w.tokenizer.eos_token_id:
        out = out[:-1]
    assert worker_text == w.tokenizer.decode(out, skip_special_tokens=True)


def test_model_worker_speculative_stream_matches_plain(tmp_path):
    """--spec-k routes greedy requests through the speculative verify
    rounds; the streamed text must equal the plain chunked worker's."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    from helpers import make_tiny_checkpoint

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))

    from dynamic_llava_tpu.serve.model_worker import ModelWorker

    plain = ModelWorker(
        controller_addr="", worker_addr="", worker_id="p0", no_register=True,
        model_path=ckpt, model_base=None, model_name="tiny-dynamic-llava",
    )
    spec = ModelWorker(
        controller_addr="", worker_addr="", worker_id="s0", no_register=True,
        model_path=ckpt, model_base=None, model_name="tiny-dynamic-llava",
        spec_k=3,
    )
    req = {"prompt": "USER : Say hello . ASSISTANT :", "temperature": 0.0,
           "max_new_tokens": 16}
    ref = json.loads(list(plain.generate_stream(dict(req)))[-1].rstrip(b"\0"))
    out = json.loads(list(spec.generate_stream(dict(req)))[-1].rstrip(b"\0"))
    assert out["error_code"] == 0
    assert out["text"] == ref["text"]

    # sampling requests must bypass the speculative path (greedy-only)
    chunks = list(spec.generate_stream(dict(req, temperature=0.8)))
    assert json.loads(chunks[-1].rstrip(b"\0"))["error_code"] == 0


def test_gradio_http_bot_flow(tmp_path, monkeypatch):
    """Exercise the web server's request flow (controller -> worker ->
    streamed state updates) without the gradio UI layer."""
    monkeypatch.chdir(tmp_path)  # conv log lands in tmp
    from dynamic_llava_tpu.conversation import default_conversation
    from dynamic_llava_tpu.serve.controller import Controller
    from dynamic_llava_tpu.serve.gradio_web_server import (
        clear_history,
        get_conv_log_filename,
        get_model_list,
        http_bot,
        regenerate,
        upvote_last_response,
    )
    from dynamic_llava_tpu.serve.http_compat import (
        controller_stdlib_app,
        worker_stdlib_app,
    )

    cport, wport = _free_port(), _free_port()
    ctrl = Controller("shortest_queue")
    csrv = controller_stdlib_app(ctrl, "127.0.0.1", cport)
    csrv.serve(background=True)
    wsrv = worker_stdlib_app(_EchoWorker(), "127.0.0.1", wport)
    wsrv.serve(background=True)
    time.sleep(0.3)
    base = f"http://127.0.0.1:{cport}"
    requests.post(base + "/register_worker", json={
        "worker_name": f"http://127.0.0.1:{wport}",
        "check_heart_beat": False, "worker_status": None,
    })

    assert get_model_list(base) == ["echo"]

    state = default_conversation.copy()
    state.append_message(state.roles[0], "hello")
    state.append_message(state.roles[1], None)
    updates = list(http_bot(state, "echo", 0.0, 1.0, 16, base))
    assert len(updates) >= 2
    final = updates[-1].messages[-1][-1]
    assert isinstance(final, str) and not final.endswith("▌")
    assert "error_code" not in final

    # regenerate blanks the assistant turn and the rerun bot flow reproduces
    # the (deterministic echo) answer
    state = updates[-1]
    out = regenerate(state)
    st2 = out[0]
    assert st2.messages[-1][-1] is None and st2.skip_next is False
    updates2 = list(http_bot(st2, "echo", 0.0, 1.0, 16, base))
    assert updates2[-1].messages[-1][-1] == final

    # votes append typed records to the same conversation log
    upvote_last_response(updates2[-1], "echo")
    with open(get_conv_log_filename()) as f:
        types = [json.loads(line)["type"] for line in f if line.strip()]
    assert types.count("chat") == 2 and "upvote" in types

    # clear_history hands back a fresh conversation
    cleared = clear_history()
    assert list(map(list, cleared[0].messages)) == list(
        map(list, default_conversation.messages))
    assert cleared[2] == "" and cleared[3] is None

    csrv.shutdown()
    wsrv.shutdown()


@pytest.mark.slow
def test_serving_soak_concurrent_mixed_load(tmp_path):
    """Soak: a REAL model worker behind the live controller proxy serving 8
    concurrent requests with mixed sampling configs — every stream
    completes without an error chunk, greedy streams are reproducible, and
    the worker stays registered afterwards (semaphore/queue hygiene)."""
    pytest.importorskip("torch")
    pytest.importorskip("tokenizers")
    import threading

    import requests

    from helpers import make_tiny_checkpoint

    from dynamic_llava_tpu.serve.controller import Controller
    from dynamic_llava_tpu.serve.http_compat import (
        controller_stdlib_app,
        worker_stdlib_app,
    )
    from dynamic_llava_tpu.serve.model_worker import ModelWorker

    ckpt = make_tiny_checkpoint(str(tmp_path / "ckpt"))
    cport, wport = _free_port(), _free_port()
    ctrl = Controller("shortest_queue")
    csrv = controller_stdlib_app(ctrl, "127.0.0.1", cport)
    csrv.serve(background=True)
    worker = ModelWorker(
        controller_addr=f"http://127.0.0.1:{cport}",
        worker_addr=f"http://127.0.0.1:{wport}",
        worker_id="soak0", no_register=True,
        model_path=ckpt, model_base=None, model_name="tiny-dynamic-llava",
        limit_model_concurrency=3,
    )
    wsrv = worker_stdlib_app(worker, "127.0.0.1", wport)
    wsrv.serve(background=True)
    time.sleep(0.3)
    base = f"http://127.0.0.1:{cport}"
    r = requests.post(base + "/register_worker", json={
        "worker_name": f"http://127.0.0.1:{wport}",
        "check_heart_beat": True,
        "worker_status": {"model_names": ["tiny-dynamic-llava"],
                          "speed": 1, "queue_length": 0},
    })
    assert r.status_code == 200

    reqs = [
        {"model": "tiny-dynamic-llava",
         "prompt": f"USER : question number {i} ? ASSISTANT :",
         "temperature": 0.0 if i % 2 == 0 else 0.7,
         "top_p": 1.0 if i % 3 else 0.9,
         "max_new_tokens": 8 + (i % 3) * 4}
        for i in range(8)
    ]
    results: list = [None] * len(reqs)

    def run(i):
        resp = requests.post(base + "/worker_generate_stream",
                             json=reqs[i], stream=True, timeout=300)
        chunks = [json.loads(c.decode()) for c in
                  resp.iter_lines(decode_unicode=False, delimiter=b"\0")
                  if c]
        results[i] = chunks

    threads = [threading.Thread(target=run, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "a stream never completed"
    for i, chunks in enumerate(results):
        assert chunks, f"request {i} got no chunks"
        assert all(c["error_code"] == 0 for c in chunks), chunks[-1]
        assert chunks[-1]["text"].startswith(reqs[i]["prompt"])

    # greedy determinism under load: rerun request 0 solo and compare
    solo: list = [None]

    def run_solo():
        resp = requests.post(base + "/worker_generate_stream",
                             json=reqs[0], stream=True, timeout=300)
        solo[0] = [json.loads(c.decode()) for c in
                   resp.iter_lines(decode_unicode=False, delimiter=b"\0")
                   if c]

    t = threading.Thread(target=run_solo)
    t.start()
    t.join(timeout=300)
    assert solo[0][-1]["text"] == results[0][-1]["text"]

    # worker still registered + responsive
    hb = requests.post(base + "/receive_heart_beat", json={
        "worker_name": f"http://127.0.0.1:{wport}", "queue_length": 0,
    }).json()
    assert hb["exist"]
    csrv.shutdown()
    wsrv.shutdown()

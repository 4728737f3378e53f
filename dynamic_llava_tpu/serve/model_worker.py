"""Model worker: loads a model, serves streaming generation over HTTP.

Rebuild of /root/reference/llava/serve/model_worker.py:49-369: registers with
the controller, heartbeats, and streams tokens as b"\\0"-delimited JSON
chunks. Generation runs on the jitted prefill/decode path; a semaphore
bounds concurrent requests per TPU (the chip runs one program at a time, so
the queue is the concurrency mechanism, same as the reference's GPU worker).
"""

from __future__ import annotations

import argparse
import base64
import json
import threading
import time
import uuid
from io import BytesIO

import numpy as np

from ..constants import WORKER_HEART_BEAT_INTERVAL
from ..utils import build_logger, server_error_msg

GB = 1 << 30

worker_id = str(uuid.uuid4())[:6]
logger = build_logger("model_worker", f"model_worker_{worker_id}.log")


def heart_beat_worker(worker: "ModelWorker"):
    while True:
        time.sleep(WORKER_HEART_BEAT_INTERVAL)
        worker.send_heart_beat()


class ModelWorker:
    def __init__(
        self,
        controller_addr: str,
        worker_addr: str,
        worker_id: str,
        no_register: bool,
        model_path: str,
        model_base: str,
        model_name: str,
        limit_model_concurrency: int = 5,
        kv_overflow: str = "drop",
        kv_window=None,
        spec_k: int = 0,
        max_queue_wait_s: float = 300.0,
    ):
        from ..mm_utils import get_model_name_from_path
        from ..models.builder import load_pretrained_model

        if spec_k > 0 and kv_overflow != "drop":
            # fail at startup, not with an opaque error chunk on every
            # greedy request (speculative decode is drop-mode only)
            raise ValueError("--spec-k requires --kv-overflow drop")
        self.controller_addr = controller_addr
        self.worker_addr = worker_addr
        self.worker_id = worker_id
        self.model_name = model_name or get_model_name_from_path(model_path)
        self.limit_model_concurrency = limit_model_concurrency
        # deployment-level KV policy: "ring" + a window serves long
        # generations at a fixed per-request cache allocation
        # (GenerationConfig.kv_overflow; single-shot requests only — the
        # worker has no multi-round cache, so the ChatSession restriction
        # does not apply)
        self.kv_overflow = kv_overflow
        self.kv_window = kv_window
        # speculative decoding for greedy requests: each round verifies
        # 1+spec_k candidates in one fused pass (generation/speculative.py);
        # 0 = off. Sampling requests always take the chunked path.
        self.spec_k = spec_k
        logger.info(f"Loading the model {self.model_name} on worker {worker_id} ...")
        (
            self.tokenizer,
            self.runtime,
            self.image_processor,
            self.context_len,
        ) = load_pretrained_model(model_path, model_base, self.model_name)
        # ONE concurrency mechanism for both server flavors (FastAPI
        # streams the same sync generator from its threadpool): a thread
        # semaphore acquired INSIDE the streamed body, so queued requests
        # can emit keep-alive acks instead of going silent until an
        # upstream proxy read-timeout kills them. Explicit counters feed
        # get_queue_length (threading.Semaphore exposes no waiter count).
        self._gate = threading.Semaphore(limit_model_concurrency)
        self._counts_lock = threading.Lock()
        self._waiting = 0
        self._active = 0
        self.max_queue_wait_s = max_queue_wait_s
        self.global_counter = 0
        # Generators (and their jitted prefill/decode-chunk programs) are
        # cached per sampling config: rebuilding one per request would
        # re-trace and re-compile the decode loop every call
        self._generators: dict = {}

        if not no_register:
            self.register_to_controller()
            self.heart_beat_thread = threading.Thread(
                target=heart_beat_worker, args=(self,), daemon=True
            )
            self.heart_beat_thread.start()

    def register_to_controller(self):
        import requests

        logger.info("Register to controller")
        url = self.controller_addr + "/register_worker"
        data = {
            "worker_name": self.worker_addr,
            "check_heart_beat": True,
            "worker_status": self.get_status(),
        }
        r = requests.post(url, json=data)
        assert r.status_code == 200

    def send_heart_beat(self):
        import requests

        logger.info(
            f"Send heart beat. Models: {[self.model_name]}. "
            f"active: {self._active}. waiting: {self._waiting}. "
            f"global_counter: {self.global_counter}"
        )
        url = self.controller_addr + "/receive_heart_beat"
        while True:
            try:
                ret = requests.post(
                    url,
                    json={
                        "worker_name": self.worker_addr,
                        "queue_length": self.get_queue_length(),
                    },
                    timeout=5,
                )
                exist = ret.json()["exist"]
                break
            except requests.exceptions.RequestException as e:
                logger.error(f"heart beat error: {e}")
            time.sleep(5)
        if not exist:
            self.register_to_controller()

    def get_queue_length(self) -> int:
        # reference semantics (running + waiting): shortest-queue dispatch
        # must see gate-queued requests, not just in-flight ones
        with self._counts_lock:
            return self._active + self._waiting

    def get_status(self) -> dict:
        return {
            "model_names": [self.model_name],
            "speed": 1,
            "queue_length": self.get_queue_length(),
        }

    def generate_stream(self, params: dict):
        from PIL import Image

        from ..generation.generate import GenerationConfig, Generator
        from ..mm_utils import (
            KeywordsStoppingCriteria,
            process_images,
            tokenizer_image_token,
        )

        tokenizer, runtime = self.tokenizer, self.runtime
        prompt = params["prompt"]
        images = params.get("images", None)
        pixels = None
        if images is not None and len(images) > 0:
            pil_images = [
                Image.open(BytesIO(base64.b64decode(im))).convert("RGB")
                for im in images
            ]
            pixels = process_images(pil_images, self.image_processor, runtime.cfg)

        temperature = float(params.get("temperature", 1.0))
        top_p = float(params.get("top_p", 1.0))
        max_new_tokens = min(int(params.get("max_new_tokens", 256)), 1024)
        stop_str = params.get("stop", None)

        input_ids = np.asarray(tokenizer_image_token(prompt, tokenizer), np.int64)
        stopping = (
            KeywordsStoppingCriteria([stop_str], tokenizer, len(input_ids))
            if stop_str
            else None
        )

        gen_key = (round(temperature, 4), round(top_p, 4))
        gen = self._generators.get(gen_key)
        if gen is None:
            gen = Generator(
                runtime.params,
                runtime.cfg,
                GenerationConfig(
                    temperature=temperature,
                    top_p=top_p,
                    eos_token_id=tokenizer.eos_token_id,
                    kv_overflow=self.kv_overflow,
                    kv_window=self.kv_window,
                ),
            )
            self._generators[gen_key] = gen

        # decode runs on device (chunked scans, or speculative verify
        # rounds for greedy requests when --spec-k is set); both producers
        # feed ONE shared stop/stream consumer so the two paths cannot
        # drift semantically
        if self.spec_k > 0 and temperature <= 0.0:
            batches = self._spec_batches(gen, input_ids, pixels,
                                         max_new_tokens)
        else:
            batches = self._chunked_batches(gen, input_ids, pixels,
                                            max_new_tokens)
        yield from self._stream_from_batches(
            batches, prompt=prompt, stop_str=stop_str, stopping=stopping,
            input_ids=input_ids, tokenizer=tokenizer,
            max_new_tokens=max_new_tokens,
        )

    def _chunked_batches(self, gen, input_ids, pixels, max_new_tokens):
        """Producer: the pipelined on-device chunked decode (the same fast
        path bench.py measures — one host sync per chunk, chunk k+1
        dispatched before chunk k's tokens are fetched). Yields raw token
        batches; closing the generator stops dispatching device work."""
        import jax

        from ..multimodal.fusion import plan_batch

        gc = gen.gen_cfg
        chunk = max(1, min(gc.decode_chunk, max_new_tokens))
        n_chunks = -(-max_new_tokens // chunk)
        plan = plan_batch(
            [input_ids],
            self.runtime.cfg.num_image_tokens if pixels is not None else 0,
            max_length=self.runtime.cfg.model_max_length,
            pad_multiple=gc.pad_multiple,
        )
        state, _ = gen.prefill_from_plan(plan, pixels, n_chunks * chunk)
        decode_chunk = gen._decode_chunk_fn(chunk)
        rng = jax.random.key(self.global_counter)
        rng, krng = jax.random.split(rng)
        state, toks = decode_chunk(gen.params, state, krng)
        for ci in range(n_chunks):
            if ci + 1 < n_chunks:
                rng, krng = jax.random.split(rng)
                next_state, next_toks = decode_chunk(gen.params, state, krng)
            yield [int(t) for t in np.asarray(toks)[:, 0]]
            if ci + 1 < n_chunks:
                state, toks = next_state, next_toks

    def _spec_batches(self, gen, input_ids, pixels, max_new_tokens):
        """Producer: speculative verify rounds in a worker thread (the
        reference's streamer-thread pattern, model_worker.py:245-258),
        yielding each round's ACCEPTED tokens. Closing the generator (stop
        hit / client disconnect) cancels the thread at round granularity —
        it must not keep dispatching device passes while the concurrency
        slot is handed to the next request."""
        import queue

        q: queue.Queue = queue.Queue()
        cancel = threading.Event()

        class _Abort(Exception):
            pass

        def on_tokens(_i, fresh):
            if cancel.is_set():
                raise _Abort()
            q.put(list(fresh))

        def run():
            try:
                gen.generate_speculative(
                    [input_ids], pixels, draft="prompt_lookup",
                    draft_k=self.spec_k, on_tokens=on_tokens,
                    max_new_tokens=max_new_tokens,
                )
                q.put(None)
            except _Abort:
                q.put(None)
            except Exception as e:  # surface as an error chunk, not a hang
                q.put(e)

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            cancel.set()
            # the gate slot is released only after this generator closes,
            # so the join keeps abandoned generations off the chip while a
            # new request starts (HBM headroom at 7B is <2.3 GB)
            t.join(timeout=120)
            if t.is_alive():
                logger.error("speculative generation thread did not stop")

    def _stream_from_batches(self, batches, *, prompt, stop_str, stopping,
                             input_ids, tokenizer, max_new_tokens):
        """Shared stop/stream consumer: accumulates fresh token batches,
        handles EOS / token budget / stop-string suffix /
        KeywordsStoppingCriteria, re-decodes the accumulated ids per batch
        (tokenizers do not detokenize incrementally in general), and
        always finishes with the trimmed full text."""
        generated: list = []
        eos = tokenizer.eos_token_id
        done = False
        try:
            for batch in batches:
                for t in batch:
                    t = int(t)
                    if t == eos or len(generated) >= max_new_tokens:
                        done = True
                        break
                    generated.append(t)
                    if stop_str or stopping is not None:
                        text = tokenizer.decode(
                            generated, skip_special_tokens=True
                        )
                        if stop_str and text.endswith(stop_str):
                            done = True  # trimmed in the final yield
                            break
                        if stopping is not None and stopping(
                            list(input_ids) + generated
                        ):
                            done = True
                            break
                if done:
                    break
                text = tokenizer.decode(generated, skip_special_tokens=True)
                yield json.dumps(
                    {"text": prompt + text, "error_code": 0}
                ).encode() + b"\0"
        finally:
            close = getattr(batches, "close", None)
            if close is not None:
                close()  # stop the producer's device work
        text = tokenizer.decode(generated, skip_special_tokens=True)
        if stop_str and text.endswith(stop_str):
            text = text[: -len(stop_str)]
        yield json.dumps({"text": prompt + text, "error_code": 0}).encode() + b"\0"

    def generate_stream_gate(self, params: dict):
        """Request entry for BOTH server flavors: acquires the concurrency
        gate inside the streamed body, yielding protocol-valid keep-alive
        acks while QUEUED (so an upstream proxy's read timeout never fires
        on a busy worker — the silence behind the reference's 'network
        error due to high traffic' failure mode), and failing loudly after
        ``max_queue_wait_s`` so a wedged worker cannot string clients
        along forever."""
        try:
            waited = 0.0
            with self._counts_lock:
                self._waiting += 1
            try:
                while not self._gate.acquire(timeout=5.0):
                    waited += 5.0
                    if waited >= self.max_queue_wait_s:
                        logger.error(
                            f"request queued past {self.max_queue_wait_s}s; "
                            "rejecting"
                        )
                        yield json.dumps(
                            {"text": server_error_msg, "error_code": 1}
                        ).encode() + b"\0"
                        return
                    yield json.dumps(
                        {"text": params.get("prompt", ""), "error_code": 0}
                    ).encode() + b"\0"
            finally:
                with self._counts_lock:
                    self._waiting -= 1
            with self._counts_lock:
                self._active += 1
            try:
                yield from self.generate_stream(params)
            finally:
                self._gate.release()
                with self._counts_lock:
                    self._active -= 1
        except ValueError as e:
            logger.error(f"Caught ValueError: {e}")
            yield json.dumps({"text": server_error_msg, "error_code": 1}).encode() + b"\0"
        except Exception as e:
            logger.error(f"Caught Unknown Error: {e}")
            yield json.dumps({"text": server_error_msg, "error_code": 1}).encode() + b"\0"


def build_app(worker: ModelWorker):
    from fastapi import FastAPI, Request
    from fastapi.responses import StreamingResponse

    app = FastAPI()

    @app.post("/worker_generate_stream")
    async def generate_stream(request: Request):
        worker.global_counter += 1
        params = await request.json()
        # the sync generator runs in starlette's threadpool; the gate (and
        # its queued-request keep-alives) lives inside generate_stream_gate
        # so queue waits stream bytes on this path too — an asyncio
        # semaphore acquired before returning the response went silent for
        # the whole wait
        return StreamingResponse(worker.generate_stream_gate(params))

    @app.post("/worker_get_status")
    async def get_status(request: Request):
        return worker.get_status()

    return app


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=40000)
    parser.add_argument("--worker-address", type=str, default="http://localhost:40000")
    parser.add_argument("--controller-address", type=str, default="http://localhost:10000")
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--model-name", type=str, default=None)
    parser.add_argument("--limit-model-concurrency", type=int, default=5)
    parser.add_argument("--no-register", action="store_true")
    parser.add_argument("--kv-overflow", choices=("drop", "ring"),
                        default="drop",
                        help="KV policy past the decode budget: drop "
                             "(reference contract) or ring (fixed-window "
                             "recency eviction for long generations)")
    parser.add_argument("--kv-window", type=int, default=None,
                        help="decode-region cache allocation per tier, in "
                             "tokens (the ring window size)")
    parser.add_argument("--spec-k", type=int, default=0,
                        help="speculative decoding: verify 1+k candidates "
                             "per fused pass for greedy requests (0 = off)")
    parser.add_argument("--max-queue-wait", type=float, default=300.0,
                        help="seconds a request may wait for a concurrency "
                             "slot (keep-alives stream meanwhile) before "
                             "it is rejected with an error chunk")
    args = parser.parse_args(argv)

    worker = ModelWorker(
        args.controller_address,
        args.worker_address,
        worker_id,
        args.no_register,
        args.model_path,
        args.model_base,
        args.model_name,
        args.limit_model_concurrency,
        kv_overflow=args.kv_overflow,
        kv_window=args.kv_window,
        spec_k=args.spec_k,
        max_queue_wait_s=args.max_queue_wait,
    )
    from .http_compat import fastapi_available, worker_stdlib_app

    if fastapi_available():
        import uvicorn

        uvicorn.run(build_app(worker), host=args.host, port=args.port,
                    log_level="info")
    else:
        logger.info("fastapi/uvicorn unavailable; serving on stdlib http")
        worker_stdlib_app(worker, args.host, args.port).serve()


if __name__ == "__main__":
    main()

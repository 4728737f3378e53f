"""Model worker: loads a model, serves streaming generation over HTTP.

Rebuild of /root/reference/llava/serve/model_worker.py:49-369: registers with
the controller, heartbeats, and streams tokens as b"\\0"-delimited JSON
chunks. Generation runs on the jitted prefill/decode path; a semaphore
bounds concurrent requests per TPU (the chip runs one program at a time, so
the queue is the concurrency mechanism, same as the reference's GPU worker).
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import threading
import time
import uuid
from functools import partial
from io import BytesIO

import numpy as np

from ..constants import WORKER_HEART_BEAT_INTERVAL
from ..utils import build_logger, pretty_print_semaphore, server_error_msg

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
    ):
        from ..mm_utils import get_model_name_from_path
        from ..models.builder import load_pretrained_model

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
        self.semaphore = None
        # thread-level concurrency gate for the stdlib server path (the
        # FastAPI path uses the asyncio `semaphore` above)
        self._gate = threading.Semaphore(limit_model_concurrency)
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
            f"Semaphore: {pretty_print_semaphore(self.semaphore)}. "
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
        if self.semaphore is None:
            return 0
        waiters = self.semaphore._waiters
        return (
            self.limit_model_concurrency
            - self.semaphore._value
            + (len(waiters) if waiters is not None else 0)
        )

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

        # decode runs on device in decode_chunk-step scans (the same fast
        # path bench.py measures); the host syncs once per chunk to stream
        # partial text and resolve stop conditions
        import jax

        from ..multimodal.fusion import plan_batch

        if self.spec_k > 0 and temperature <= 0.0:
            yield from self._stream_speculative(
                gen, input_ids, pixels, max_new_tokens, prompt,
                stop_str, stopping, tokenizer,
            )
            return

        gc = gen.gen_cfg
        chunk = max(1, min(gc.decode_chunk, max_new_tokens))
        n_chunks = -(-max_new_tokens // chunk)
        plan = plan_batch(
            [input_ids],
            runtime.cfg.num_image_tokens if pixels is not None else 0,
            max_length=runtime.cfg.model_max_length,
            pad_multiple=gc.pad_multiple,
        )
        state, _ = gen.prefill_from_plan(plan, pixels, n_chunks * chunk)
        decode_chunk = gen._decode_chunk_fn(chunk)
        rng = jax.random.key(self.global_counter)

        generated: list = []
        eos = tokenizer.eos_token_id
        done = False
        # pipelined: dispatch chunk k+1 before fetching chunk k's tokens so
        # the host round-trip + detokenize overlap device compute (same
        # pattern as Generator.generate)
        rng, krng = jax.random.split(rng)
        state, toks = decode_chunk(gen.params, state, krng)
        for ci in range(n_chunks):
            if ci + 1 < n_chunks:
                rng, krng = jax.random.split(rng)
                next_state, next_toks = decode_chunk(gen.params, state, krng)
            toks_np = np.asarray(toks)[:, 0]  # one host sync per chunk
            text = None
            for t in toks_np:
                t = int(t)
                if t == eos or len(generated) >= max_new_tokens:
                    done = True
                    break
                generated.append(t)
                if stop_str or stopping is not None:
                    text = tokenizer.decode(generated, skip_special_tokens=True)
                    if stop_str and text.endswith(stop_str):
                        generated_text = text[: -len(stop_str)]
                        yield json.dumps(
                            {"text": prompt + generated_text, "error_code": 0}
                        ).encode() + b"\0"
                        done = True
                        break
                    if stopping is not None and stopping(list(input_ids) + generated):
                        done = True
                        break
            if not done:
                text = tokenizer.decode(generated, skip_special_tokens=True)
                yield json.dumps(
                    {"text": prompt + text, "error_code": 0}
                ).encode() + b"\0"
            if done:
                break
            if ci + 1 < n_chunks:
                state, toks = next_state, next_toks
        text = tokenizer.decode(generated, skip_special_tokens=True)
        if stop_str and text.endswith(stop_str):
            text = text[: -len(stop_str)]
        yield json.dumps({"text": prompt + text, "error_code": 0}).encode() + b"\0"

    def _stream_speculative(self, gen, input_ids, pixels, max_new_tokens,
                            prompt, stop_str, stopping, tokenizer):
        """Greedy request on the speculative path: verify rounds run in a
        worker thread (the reference's streamer-thread pattern,
        model_worker.py:245-258) and accepted tokens stream out per round.
        On a stop-string hit the HTTP stream ends; the bounded generation
        thread drains in the background (same abort semantics as the
        reference's streamer)."""
        import queue
        import threading

        q: queue.Queue = queue.Queue()

        def on_tokens(_i, fresh):
            q.put(fresh)

        def run():
            try:
                gen.generate_speculative(
                    [input_ids], pixels, draft="prompt_lookup",
                    draft_k=self.spec_k, on_tokens=on_tokens,
                    max_new_tokens=max_new_tokens,
                )
                q.put(None)
            except Exception as e:  # surface as an error chunk, not a hang
                q.put(e)

        threading.Thread(target=run, daemon=True).start()

        eos = tokenizer.eos_token_id
        generated: list = []
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            done = False
            for t in item:
                if t == eos:
                    done = True
                    break
                generated.append(t)
                if stop_str or stopping is not None:
                    text = tokenizer.decode(generated,
                                            skip_special_tokens=True)
                    if stop_str and text.endswith(stop_str):
                        done = True  # suffix trimmed in the final yield
                        break
                    if stopping is not None and stopping(
                        list(input_ids) + generated
                    ):
                        done = True
                        break
            text = tokenizer.decode(generated, skip_special_tokens=True)
            if stop_str and text.endswith(stop_str):
                text = text[: -len(stop_str)]
            yield json.dumps(
                {"text": prompt + text, "error_code": 0}
            ).encode() + b"\0"
            if done:
                break

    def generate_stream_gate(self, params: dict):
        """Stdlib-server entry: gates concurrency with a thread semaphore
        (the FastAPI app uses an asyncio semaphore instead,
        build_app/acquire below) and yields protocol-valid keep-alive acks
        while QUEUED, so an upstream proxy's read timeout never fires on a
        busy worker — the queue-wait silence behind the reference's
        'network error due to high traffic' failure mode."""
        try:
            while not self._gate.acquire(timeout=5.0):
                yield json.dumps(
                    {"text": params.get("prompt", ""), "error_code": 0}
                ).encode() + b"\0"
            try:
                yield from self.generate_stream(params)
            finally:
                self._gate.release()
        except ValueError as e:
            logger.error(f"Caught ValueError: {e}")
            yield json.dumps({"text": server_error_msg, "error_code": 1}).encode() + b"\0"
        except Exception as e:
            logger.error(f"Caught Unknown Error: {e}")
            yield json.dumps({"text": server_error_msg, "error_code": 1}).encode() + b"\0"


def build_app(worker: ModelWorker):
    from fastapi import BackgroundTasks, FastAPI, Request
    from fastapi.responses import StreamingResponse

    app = FastAPI()

    def release_model_semaphore(fn=None):
        worker.semaphore.release()
        if fn is not None:
            fn()

    @app.post("/worker_generate_stream")
    async def generate_stream(request: Request):
        worker.global_counter += 1
        params = await request.json()
        if worker.semaphore is None:
            worker.semaphore = asyncio.Semaphore(worker.limit_model_concurrency)
        await worker.semaphore.acquire()
        worker.send_heart_beat()
        generator = worker.generate_stream_gate(params)
        background_tasks = BackgroundTasks()
        background_tasks.add_task(
            partial(release_model_semaphore, fn=worker.send_heart_beat)
        )
        return StreamingResponse(generator, background=background_tasks)

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

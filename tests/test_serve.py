"""REST serving tests: stdlib server round trip with the classical backend."""

import io
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from stereo_tpu.core.config import MatchingConfig, PipelineConfig
from stereo_tpu.serve import (DepthEstimationServer,
                              decode_png_to_pipeline_image,
                              encode_disparity_png)

TINY = MatchingConfig(height=16, width=32, downscale_factor=2,
                      min_disparity=0, max_disparity=8, cost_patch_radius=1,
                      sad_patch_radius=1, threshold=5, small_mbm_radius=1,
                      mid_mbm_radius=1, large_mbm_radius=2)


def _png_bytes(h, w):
    arr = np.random.default_rng(0).integers(0, 256, (h, w, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


class TestCodecs:
    def test_decode_resizes(self):
        img = decode_png_to_pipeline_image(_png_bytes(10, 20), (16, 32))
        assert img.shape == (3, 16, 32)

    def test_decode_is_uint8_and_upcast_is_device_f32(self):
        # The wire contract: decode keeps uint8 (1 byte/pixel upload) and
        # the upcast to f32 runs on device with exact values.
        from stereo_tpu.serve.api import device_upcast_f32

        img = decode_png_to_pipeline_image(_png_bytes(16, 32), (16, 32))
        assert img.dtype == np.uint8
        dev = device_upcast_f32(img)
        assert hasattr(dev, "devices")               # jax device array
        assert dev.dtype == np.float32
        np.testing.assert_array_equal(np.asarray(dev), img.astype(np.float32))

    def test_encode_roundtrip(self):
        disp = np.linspace(0, 64, 16 * 32, dtype=np.float32).reshape(16, 32)
        png = encode_disparity_png(disp)
        back = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(back, np.round(disp).astype(np.uint8))


@pytest.fixture(scope="module")
def server_url():
    """A live server on an ephemeral port, stereo backend only (the RVS path
    needs Deep3D weights; the serving contract is identical)."""

    class StereoOnlyServer(DepthEstimationServer):
        def run_pipeline(self, png_bytes):
            left = decode_png_to_pipeline_image(png_bytes,
                                                self.config.image_shape)
            right = np.roll(left, -2, axis=-1)
            result = self.pipeline.process(left, right)
            return encode_disparity_png(np.asarray(result.disparity_map))

    config = PipelineConfig(image_shape=(16, 32), min_disparity=0,
                            max_disparity=8, matching=TINY,
                            stereo_matching_backend="classical")
    server = StereoOnlyServer(config)
    httpd = ThreadingHTTPServer(("localhost", 0), server.make_handler())
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://localhost:{httpd.server_address[1]}"
    httpd.shutdown()


class TestServer:
    def test_get_info(self, server_url):
        with urllib.request.urlopen(server_url) as resp:
            assert b"classical" in resp.read()

    def test_post_raw_png(self, server_url):
        req = urllib.request.Request(server_url, data=_png_bytes(16, 32),
                                     method="POST")
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"] == "image/png"
            out = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert out.shape == (16, 32)

    def test_post_multipart(self, server_url):
        boundary = "xxBOUNDARYxx"
        payload = _png_bytes(16, 32)
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="left.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + payload + \
            f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            server_url, data=body, method="POST",
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as resp:
            out = np.asarray(Image.open(io.BytesIO(resp.read())))
        assert out.shape == (16, 32)

    def test_bad_payload(self, server_url):
        req = urllib.request.Request(server_url, data=b"not a png",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req)
        assert err.value.code == 400


class TestMultipartParser:
    """Unit tests for the minimal multipart parser (no server needed)."""

    @staticmethod
    def _body(payload: bytes, boundary: str = "BNDRY") -> bytes:
        return ((f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="file"; filename="x.bin"\r\n'
                 f"Content-Type: application/octet-stream\r\n\r\n").encode()
                + payload + f"\r\n--{boundary}--\r\n".encode())

    def test_payload_ending_in_crlf_dash_survives(self):
        from stereo_tpu.serve.api import _extract_multipart_file

        # bytes a greedy rstrip(b"\r\n-") would have truncated
        payload = b"\x89PNGdata\r\n---\r\n"
        body = self._body(payload)
        got = _extract_multipart_file(
            body, "multipart/form-data; boundary=BNDRY")
        assert got == payload

    def test_quoted_boundary(self):
        from stereo_tpu.serve.api import _extract_multipart_file

        payload = b"abc"
        body = self._body(payload)
        got = _extract_multipart_file(
            body, 'multipart/form-data; boundary="BNDRY"')
        assert got == payload

    def test_non_file_parts_skipped(self):
        from stereo_tpu.serve.api import _extract_multipart_file

        boundary = "BNDRY"
        body = ((f"--{boundary}\r\nContent-Disposition: form-data; "
                 f'name="note"\r\n\r\n').encode() + b"just a field" +
                b"\r\n" + self._body(b"payload", boundary))
        got = _extract_multipart_file(
            body, f"multipart/form-data; boundary={boundary}")
        assert got == b"payload"


class TestMicroBatcher:
    class _StubPipeline:
        """Records batch sizes; 1st call is slow so later submits queue up."""

        def __init__(self):
            self.batch_sizes = []
            self._first = True

        def process_batch(self, lefts, rights):
            import time as _time
            from types import SimpleNamespace

            assert rights is None
            self.batch_sizes.append(lefts.shape[0])
            if self._first:
                self._first = False
                _time.sleep(0.3)
            return SimpleNamespace(disparity_map=lefts.sum(axis=1))

    def test_coalesces_concurrent_requests(self):
        from stereo_tpu.serve.api import MicroBatcher

        stub = self._StubPipeline()
        batcher = MicroBatcher(stub, max_batch=4, max_wait_ms=50.0)
        frames = [np.full((3, 4, 6), float(i), np.float32) for i in range(5)]
        futures = [batcher.submit(f) for f in frames]
        results = [f.result(timeout=10) for f in futures]
        batcher.shutdown()

        # every request got its own frame's answer
        for i, r in enumerate(results):
            np.testing.assert_allclose(r, 3.0 * i)
        # first went alone (worker was idle); the rest coalesced into one
        # padded batch while the slow first dispatch ran
        assert stub.batch_sizes[0] == 4          # padded to max_batch
        assert len(stub.batch_sizes) <= 3
        assert batcher.frames_run == 5
        assert batcher.batches_run < 5

    def test_overlap_pipeline_preserves_order_across_batches(self):
        """Many groups in flight: the dispatch/readback overlap (r5) must
        still resolve every future with ITS OWN frame's result, and a
        readback failure must not wedge later groups."""
        from stereo_tpu.serve.api import MicroBatcher

        stub = self._StubPipeline()
        batcher = MicroBatcher(stub, max_batch=2, max_wait_ms=5.0, depth=2)
        frames = [np.full((3, 4, 6), float(i), np.float32) for i in range(12)]
        futures = [batcher.submit(f) for f in frames]
        for i, f in enumerate(futures):
            np.testing.assert_allclose(f.result(timeout=10), 3.0 * i)
        assert batcher.frames_run == 12
        assert batcher.batches_run >= 6   # groups of <=2, all drained
        batcher.shutdown()

    def test_error_propagates_to_all_waiters(self):
        from stereo_tpu.serve.api import MicroBatcher

        class Exploding:
            def process_batch(self, lefts, rights):
                raise RuntimeError("engine down")

        batcher = MicroBatcher(Exploding(), max_batch=2, max_wait_ms=20.0)
        futures = [batcher.submit(np.zeros((3, 4, 6), np.float32))
                   for _ in range(2)]
        for f in futures:
            with pytest.raises(RuntimeError, match="engine down"):
                f.result(timeout=10)
        batcher.shutdown()


class TestAsgiApp:
    """The ASGI 3 surface, driven through the raw scope/receive/send
    protocol — no ASGI server (or fastapi) needed."""

    class _StubPipeline:
        def process(self, left, right):
            from types import SimpleNamespace

            assert right is None                     # single-view contract
            return SimpleNamespace(disparity_map=left.mean(axis=0))

    def _app(self):
        from stereo_tpu.serve.api import create_asgi_app

        config = PipelineConfig(image_shape=(16, 32), min_disparity=0,
                                max_disparity=8, matching=TINY,
                                stereo_matching_backend="classical")
        return create_asgi_app(config, pipeline=self._StubPipeline())

    @staticmethod
    def _call(app, method, body=b"", content_type=None):
        import asyncio

        headers = ([(b"content-type", content_type.encode())]
                   if content_type else [])
        scope = {"type": "http", "method": method, "path": "/",
                 "headers": headers}
        messages = [{"type": "http.request", "body": body,
                     "more_body": False}]
        sent = []

        async def receive():
            return messages.pop(0)

        async def send(message):
            sent.append(message)

        asyncio.run(app(scope, receive, send))
        status = sent[0]["status"]
        resp_headers = dict(sent[0]["headers"])
        payload = b"".join(m.get("body", b"") for m in sent[1:])
        return status, resp_headers, payload

    def test_get_info(self):
        status, headers, body = self._call(self._app(), "GET")
        assert status == 200
        assert b"classical" in body

    def test_post_raw_png(self):
        status, headers, body = self._call(self._app(), "POST",
                                           _png_bytes(16, 32))
        assert status == 200
        assert headers[b"content-type"] == b"image/png"
        out = np.asarray(Image.open(io.BytesIO(body)))
        assert out.shape == (16, 32)

    def test_post_multipart(self):
        boundary = "xxASGIxx"
        payload = _png_bytes(16, 32)
        body = (f"--{boundary}\r\nContent-Disposition: form-data; "
                f'name="file"; filename="left.png"\r\n'
                f"Content-Type: image/png\r\n\r\n").encode() + payload + \
            f"\r\n--{boundary}--\r\n".encode()
        status, headers, resp = self._call(
            self._app(), "POST", body,
            content_type=f"multipart/form-data; boundary={boundary}")
        assert status == 200
        out = np.asarray(Image.open(io.BytesIO(resp)))
        assert out.shape == (16, 32)

    def test_bad_payload_is_400(self):
        status, headers, body = self._call(self._app(), "POST", b"not a png")
        assert status == 400
        assert b"error" in body

    def test_method_not_allowed(self):
        status, _, _ = self._call(self._app(), "DELETE")
        assert status == 405

    def test_pipeline_failure_is_500(self):
        # Server-side faults (device error, batcher timeout) must NOT be
        # labelled 400: monitoring and load balancers treat 4xx as the
        # client's fault.
        from stereo_tpu.serve.api import create_asgi_app

        class ExplodingPipeline:
            def process(self, left, right):
                raise RuntimeError("device fell over")

        config = PipelineConfig(image_shape=(16, 32), min_disparity=0,
                                max_disparity=8, matching=TINY,
                                stereo_matching_backend="classical")
        app = create_asgi_app(config, pipeline=ExplodingPipeline())
        status, _, body = self._call(app, "POST", _png_bytes(16, 32))
        assert status == 500
        assert b"device fell over" in body


class TestCheckpointErrors:
    def test_explicit_missing_rvs_checkpoint_raises(self):
        # A typo'd --rvs-checkpoint must fail loudly, not silently fall
        # back to the default committed weights (which would record
        # ablation results measured on the baseline model).
        from stereo_tpu.synthesis import RightViewSynthesis

        with pytest.raises(FileNotFoundError, match="no_such_ckpt"):
            RightViewSynthesis(output_shape=(48, 96),
                               checkpoint_dir="/tmp/no_such_ckpt")

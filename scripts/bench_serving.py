"""REST-serving throughput/latency benchmark on the real device.

Spins the stdlib threaded server in-process (classical backend by default),
fires concurrent PNG uploads from client threads, and reports steady-state
requests/s plus p50/p99 latency — the production-facing number the compute
benchmarks (bench.py) don't capture: it includes PNG codec work, HTTP
overhead, micro-batch coalescing, and device<->host transfer.

Note when the accelerator sits behind a network tunnel (this container),
per-request latency is dominated by the tunnel round trip + the disparity
download, not by compute — the uint8 on-device quantization in
``serve.api`` exists exactly to shrink that download 4x.

Writes ``results/serving/serving_<backend>.json``.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stereo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from stereo_tpu.core.config import PipelineConfig
from stereo_tpu.serve import DepthEstimationServer


def make_png(height: int, width: int, seed: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (height, width, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default="classical")
    parser.add_argument("--height", type=int, default=384)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--max-disparity", type=int, default=64)
    parser.add_argument("--micro-batch", type=int, default=8,
                        help="8 rides the measured single-view batch curve "
                             "(357 frames/s at batch 8, results/scaling/"
                             "single_view_batch_tpu.json)")
    parser.add_argument("--clients", type=int, default=12)
    parser.add_argument("--requests", type=int, default=240)
    parser.add_argument("--output-dir", default="results/serving")
    args = parser.parse_args()

    config = PipelineConfig(image_shape=(args.height, args.width),
                            min_disparity=0,
                            max_disparity=args.max_disparity,
                            stereo_matching_backend=args.backend)
    server = DepthEstimationServer(config, micro_batch=args.micro_batch)
    httpd = ThreadingHTTPServer(("localhost", 0), server.make_handler())
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://localhost:{httpd.server_address[1]}"

    # Tunnel-weather probe: raw device link bandwidth at record time.  The
    # serving numbers are transfer-dominated behind a remote tunnel whose
    # throughput varies >10x day to day; recording the link speed makes
    # records comparable across rounds.
    import jax as _jax
    import numpy as _np

    def _probe_bw() -> dict:
        x = _np.random.default_rng(0).integers(
            0, 255, (8, 1024, 1024), dtype=_np.uint8)   # 8 MB
        t0 = time.perf_counter()
        dev = _jax.block_until_ready(_jax.device_put(x))
        up = 8.0 / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        _np.asarray(dev)
        down = 8.0 / (time.perf_counter() - t0)
        return {"upload_MBps": round(up, 1), "download_MBps": round(down, 1)}

    tunnel_bw = _probe_bw()
    print(f"tunnel link: {tunnel_bw}")

    # Distinct payloads (the device tunnel memoizes value-identical work).
    payloads = [make_png(args.height, args.width, s) for s in range(16)]

    def post(i: int) -> float:
        req = urllib.request.Request(url, data=payloads[i % len(payloads)],
                                     method="POST")
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=300) as resp:
            body = resp.read()
            assert resp.status == 200 and body[:4] == b"\x89PNG"
        return time.perf_counter() - t0

    # Warmup: compile + caches.
    for i in range(max(args.micro_batch, 2)):
        post(i)

    latencies: list = []
    lock = threading.Lock()
    counter = {"next": 0}

    def worker():
        while True:
            with lock:
                i = counter["next"]
                if i >= args.requests:
                    return
                counter["next"] = i + 1
            dt = post(i)
            with lock:
                latencies.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    # ---- wire-vs-compute decomposition (single-frame, post-load) -------
    # Times each stage of one request's journey so the record states WHERE
    # the latency lives: PNG decode, uint8 upload + device compute +
    # on-device quantization (blocked), u8 download, PNG encode.
    import io as _io

    from PIL import Image as _Image

    import jax as _jax

    from stereo_tpu.serve.api import (_quantize_disparity_device,
                                      decode_png_to_pipeline_image,
                                      device_upcast_f32)

    def _stage_times(png: bytes) -> dict:
        t0 = time.perf_counter()
        left = decode_png_to_pipeline_image(png, config.image_shape)
        t1 = time.perf_counter()
        dev = device_upcast_f32(np.stack([left] * args.micro_batch))
        res = server.pipeline.process_batch(dev, None)
        d_u8 = _quantize_disparity_device(res.disparity_map)
        _jax.block_until_ready(d_u8)
        t2 = time.perf_counter()
        host = np.asarray(d_u8)
        t3 = time.perf_counter()
        buf = _io.BytesIO()
        _Image.fromarray(host[0]).save(buf, format="PNG")
        t4 = time.perf_counter()
        return {"png_decode_ms": (t1 - t0) * 1e3,
                "upload_compute_quantize_ms": (t2 - t1) * 1e3,
                "u8_download_ms": (t3 - t2) * 1e3,
                "png_encode_ms": (t4 - t3) * 1e3}

    stage_runs = [_stage_times(payloads[i]) for i in range(3)]
    breakdown = {k: round(float(np.median([r[k] for r in stage_runs])), 1)
                 for k in stage_runs[0]}
    device_share = breakdown["upload_compute_quantize_ms"]
    wire_share = breakdown["u8_download_ms"]
    codec_share = breakdown["png_decode_ms"] + breakdown["png_encode_ms"]

    lat_ms = np.asarray(latencies) * 1000.0
    result = {
        "backend": args.backend,
        "image_shape": [args.height, args.width],
        "micro_batch": args.micro_batch,
        "clients": args.clients,
        "requests": args.requests,
        "requests_per_s": round(args.requests / wall, 2),
        "latency_ms": {"p50": round(float(np.percentile(lat_ms, 50)), 1),
                       "p99": round(float(np.percentile(lat_ms, 99)), 1),
                       "mean": round(float(lat_ms.mean()), 1)},
        "batches_run": server.batcher.batches_run if server.batcher else None,
        "frames_run": server.batcher.frames_run if server.batcher else None,
        "tunnel_link_at_record_time": tunnel_bw,
        "per_batch_stage_breakdown_ms": breakdown,
        "bound_decomposition": {
            "note": "median single-batch stage times after load "
                    "(batch = micro_batch frames); the overlap pipeline "
                    "(MicroBatcher dispatch/readback threads) hides "
                    "u8_download behind the next batch's upload+compute",
            "device_upload_compute_ms": round(device_share, 1),
            "wire_download_ms": round(wire_share, 1),
            "host_png_codec_ms": round(codec_share, 1),
        },
        "note": ("end-to-end HTTP: PNG decode, micro-batch coalescing, "
                 "uint8 frame upload + on-device f32 upcast, device "
                 "compute, on-device u8 disparity quantization, PNG "
                 "encode; remote-tunnel transfer dominates latency in "
                 "this container"
                 + (" (fp32 upload measured 4.3 req/s / p50 1.75 s on "
                    "the same classical setup)"
                    if args.backend == "classical" else "")),
    }
    httpd.shutdown()
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, f"serving_{args.backend}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()

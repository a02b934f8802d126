"""Headline benchmark: classical MBM stereo FPS/chip at the KITTI config.

Baseline (BASELINE.md): the reference's CUDA classical backend runs 30 FPS
end-to-end at 384x1280 with disparity range 0..64 on an unspecified GPU;
GwcNet 6 FPS and MSNet3D 4 FPS are secondary metrics reported in the same
JSON line.  Secondary metrics are measured FIRST (the classical headline is
cheap to compile and its measurement is reserved a fixed tail budget) so
variable remote-compile latency can no longer starve them; a persistent
compilation cache makes repeat runs cheap.

Measurement protocol (the chip is reached through a network tunnel whose
runtime memoizes value-identical executions, elides unconsumed outputs, and
adds large fixed RPC latency — naive loops report absurd numbers):

* every execution gets a DISTINCT device-derived input (``+ i * 1e-38``);
* every result is consumed by one final on-device reduction (no elision);
* the device runs the M programs serially (single core).  The headline
  uses the MARGINAL cost between a small and a large M (fixed tunnel
  latency differenced out); the expensive-to-compile secondary metrics use
  one static-M executable with M large enough to amortize the latency
  (bias <2%, conservative) — see ``_single_m_fps``.

Prints exactly ONE JSON line:
``{"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# COMMITTED seed cache: the driver's end-of-round run starts from a fresh
# checkout, and cold remote compiles (msnet3d alone can eat 10 minutes)
# starved 3-4 secondary keys out of the 540 s budget in r3 and in an r4
# cold rehearsal.  A few hundred MB of compiled executables for the exact
# bench programs makes every driver run warm; a cache miss (new jaxlib,
# changed program) falls back to compiling exactly as before.  When bench
# programs change, DELETE the stale entries and re-seed (rather than
# accumulate) — every superseded executable otherwise grows git history
# permanently.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_cache")


def _enable_compile_cache() -> None:
    """Persistent compilation cache (tests have one; bench runs repeat the
    same programs across rounds and development runs warm the driver's)."""
    from stereo_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(_CACHE_DIR)


def _marginal_fps(frame_fn, args, m_small: int, m_large: int):
    """Serialized device throughput via the marginal-cost protocol.

    One executable per M: an in-graph ``lax.map`` over M *distinct* frame
    inputs whose per-frame sums are all consumed by one reduction — a
    single dispatch and a single scalar readback, so per-call RPC cost
    cannot pollute the measurement.  Every invocation also takes a fresh
    ``seed`` operand so repeat runs are never value-identical (the tunnel
    memoizes value-identical executions).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    # ONE executable with a dynamic trip count: the M_small and M_large
    # measurements share it, halving remote-compile cost (the dominant
    # wall-clock for the DNN metrics — msnet3d's compile alone can eat a
    # whole job budget).  fori_loop iterations are strictly sequential, so
    # the marginal cost per iteration is still the true per-frame time.
    @jax.jit
    def run_m(seed, m, *a):
        def body(i, acc):
            frame = frame_fn(a[0] + (seed + i.astype(jnp.float32)) * 1e-38,
                             *a[1:])
            return acc + jnp.sum(frame)
        return lax.fori_loop(0, m, body, jnp.float32(0.0))

    def timed(seed, m):
        t0 = time.perf_counter()
        total = float(run_m(jnp.float32(seed), m, *args))
        return time.perf_counter() - t0, total

    timed(1.0, m_small)                                         # compile
    t_small = min(timed(3.0, m_small)[0], timed(4.0, m_small)[0])
    (t_large_a, total) = timed(5.0, m_large)
    t_large = min(t_large_a, timed(6.0, m_large)[0])
    slope = max((t_large - t_small) / (m_large - m_small), 1e-6)
    fixed_ms = max(t_small - slope * m_small, 0.0) * 1000.0
    return 1.0 / slope, fixed_ms, total / m_large


def _rpc_floor_s() -> float:
    """Lower bound on the fixed per-dispatch tunnel cost: the min over a
    few dispatch+scalar-readback round trips of a trivial jitted program.
    A LOWER bound, so subtracting it from a measured wall can only leave
    the per-frame estimate high (reported FPS stays conservative)."""
    import jax
    import jax.numpy as jnp

    trivial = jax.jit(lambda s: s + 1.0)
    float(trivial(jnp.float32(0.0)))                            # compile
    floors = []
    for seed in (2.0, 4.0, 6.0, 8.0):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(seed)))
        floors.append(time.perf_counter() - t0)
    return min(floors)


def _single_m_fps(frame_fn, args, m: int):
    """Single-executable throughput for the expensive-to-compile metrics.

    The marginal protocol's dynamic-trip-count ``fori_loop`` makes Mosaic /
    big-model compiles pathologically slow (the Middlebury Pallas metric
    went from ~1 min to >4 min and timed out), and two static executables
    double the remote-compile cost that already dominates these jobs.  So:
    ONE static-length in-graph ``lax.map`` over ``m`` distinct seeded
    frames, all results consumed, timed twice with fresh seeds (min taken).
    The ~28 ms fixed tunnel latency is differenced out by subtracting a
    measured LOWER bound on the per-dispatch floor (``_rpc_floor_s``) —
    without it the fast metrics understate badly (e2e at m=50: ~11% low).
    Any floor underestimate still leaves the reported FPS conservative.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def run_m(seed, *a):
        def one(i):
            return jnp.sum(frame_fn(a[0] + (seed + i) * 1e-38, *a[1:]))
        return jnp.sum(lax.map(one, jnp.arange(m, dtype=jnp.float32)))

    def timed(seed):
        t0 = time.perf_counter()
        float(run_m(jnp.float32(seed), *args))
        return time.perf_counter() - t0

    timed(1.0)                                                  # compile
    wall = min(timed(3.0), timed(5.0))
    return m / max(wall - _rpc_floor_s(), wall * 0.1)


def _chained_slope_fps(chain_fn, make_input, m_small: int = 8,
                       m_large: int = 24):
    """Dispatch-slope throughput for multi-executable (chained) paths.

    Split-executable inference (the Mosaic-in-module penalty — see
    ``synthesis/right_view_synthesis.py``'s module docstring) cannot be
    timed by the in-graph protocols: the chain crosses executable
    boundaries.  Instead the chain is dispatched over M unique on-device
    inputs (dispatches queue asynchronously; one block at the end), at two
    M values, slope taken — fixed tunnel cost cancels.  ``make_input(i)``
    must be an on-device producer (a jitted perturb of a resident base
    array): unique values defeat the tunnel's value-identical execution
    memoization, and nothing crosses the tunnel per frame.  Each M is
    timed twice, min taken.
    """
    import jax

    counter = [0]

    def fresh():
        counter[0] += 1
        return make_input(counter[0])

    jax.block_until_ready(chain_fn(fresh()))                    # compile

    def timed(m):
        ins = [fresh() for _ in range(m)]
        jax.block_until_ready(ins)
        t0 = time.perf_counter()
        outs = [chain_fn(x) for x in ins]
        jax.block_until_ready(outs[-1])
        return time.perf_counter() - t0

    t_small = min(timed(m_small), timed(m_small))
    t_large = min(timed(m_large), timed(m_large))
    slope = max((t_large - t_small) / (m_large - m_small), 1e-6)
    return 1.0 / slope


def _kitti_pair():
    """The deterministic synthetic KITTI-config pair (true disparity 11)
    used by both the headline measurement and the committed TPU golden
    (``scripts/capture_tpu_golden.py --kitti``)."""
    rng = np.random.default_rng(0)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    right = np.roll(left, -11, axis=-1)
    return left, right


_KITTI_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "golden",
                             "kitti_synthetic_disparity_tpu.npz")


def _classical_fps(extra: dict):
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    left, right = _kitti_pair()
    ld = jax.device_put(jnp.asarray(left))
    rd = jax.device_put(jnp.asarray(right))

    fps, fixed_ms, mean_sum = _marginal_fps(
        lambda l, r: compute_disparity_map(l, r, cfg), (ld, rd),
        m_small=10, m_large=110)
    # sanity: the synthetic pair has true disparity 11; the sum over the
    # (mostly interior) map must sit near 11 * H * W.  A real raise, not
    # ``assert`` — the gate must survive ``python -O``.
    mean_disparity = mean_sum / (384 * 1280)
    if not 8.0 < mean_disparity < 14.0:
        raise RuntimeError(f"classical sanity failed: mean {mean_disparity}")
    extra["tunnel_fixed_latency_ms"] = round(fixed_ms, 1)

    # Semantic gate at the headline config: the committed TPU golden must
    # match within 0.5 px on >= 99% of pixels (the same contract as the
    # Middlebury/Pallas golden; VERDICT r3 #7).  Fps is already recorded in
    # ``extra`` by the caller order, so a drift raises loudly without
    # losing the measurement.
    if os.path.exists(_KITTI_GOLDEN):
        golden = np.load(_KITTI_GOLDEN)["disparity"]

        @jax.jit
        def frac_within(l, r, g):
            disp = compute_disparity_map(l, r, cfg)
            return jnp.mean((jnp.abs(disp - g.astype(jnp.float32))
                             <= 0.5).astype(jnp.float32))

        frac = float(frac_within(ld, rd, jax.device_put(golden)))
        extra["kitti_golden_frac_within_0p5px"] = round(frac, 4)
        if frac < 0.99:
            # Loud in the record, but never at the cost of the JSON line
            # (this runs in the main process, unlike the Middlebury gate).
            extra.setdefault("job_errors", {})["kitti_golden"] = (
                f"disparity drifted: only {frac:.4f} of pixels within "
                f"0.5px of the committed TPU golden")
            print(f"bench: KITTI golden gate FAILED ({frac:.4f})",
                  file=sys.stderr)
    return fps


_DEMO_DIR = "/root/reference/src/python/data"
_TPU_GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tests", "golden",
                           "middlebury_demo_disparity_pallas_tpu.npz")


def _middlebury_fps():
    """Classical engine at the Middlebury 1080p config (disparity 75..262),
    where ``impl='auto'`` selects the Pallas streamed-volume kernels —
    driver-captured evidence for the Pallas path."""
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    cfg = MatchingConfig()   # Middlebury defaults: 1080x1920, 75..262
    rng = np.random.default_rng(1)
    left = np.round(rng.uniform(0, 255, (3, cfg.height, cfg.width))
                    ).astype(np.float32)
    right = np.roll(left, -90, axis=-1)
    ld = jax.device_put(jnp.asarray(left))
    rd = jax.device_put(jnp.asarray(right))
    return _single_m_fps(lambda l, r: compute_disparity_map(l, r, cfg),
                         (ld, rd), m=100)


def _middlebury_golden_frac():
    """The Pallas semantic gate: when the demo pair and the committed
    TPU-captured golden are available, the REAL demo disparity must match
    the golden within 0.5 px on >= 99% of pixels (upgrade over the old
    mean-disparity window; VERDICT r2 #4).  Transfers stay small: images
    upload as uint8 and the comparison runs on device (one scalar back).

    Returns the matching fraction, or None when demo/golden are absent.
    The caller asserts the gate AFTER reporting fps and frac, so a drift
    (or a budget kill during this second compile) can never silently drop
    the already-measured fps from the record.
    """
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map

    if not (os.path.isdir(_DEMO_DIR) and os.path.exists(_TPU_GOLDEN)):
        return None
    from PIL import Image

    cfg = MatchingConfig()
    left8 = np.asarray(Image.open(os.path.join(_DEMO_DIR, "im0.png")),
                       np.uint8).transpose(2, 0, 1)
    right8 = np.asarray(Image.open(os.path.join(_DEMO_DIR, "im1.png")),
                        np.uint8).transpose(2, 0, 1)
    golden = np.load(_TPU_GOLDEN)["disparity"]

    @jax.jit
    def frac_within(l8, r8, g):
        disp = compute_disparity_map(l8.astype(jnp.float32),
                                     r8.astype(jnp.float32), cfg)
        return jnp.mean((jnp.abs(disp - g.astype(jnp.float32))
                         <= 0.5).astype(jnp.float32))

    return float(frac_within(jax.device_put(left8), jax.device_put(right8),
                             jax.device_put(golden)))


_E2E_SHARED: dict = {}


def _e2e_shared():
    """Load the Deep3D checkpoint and upload it ONCE per worker process.

    The ~150 MB weight pytree crosses the ~1.3 MB/s tunnel in minutes; the
    fp32 arm, the bf16 arm, and the one-module secondary all consume the
    SAME values (the bf16 arm casts IN-GRAPH), so re-uploading per arm
    tripled the e2e job's wall time on a cold server (a fresh-clone
    rehearsal measured 228 s vs ~45 s)."""
    if not _E2E_SHARED:
        import jax

        from stereo_tpu.synthesis.right_view_synthesis import \
            RightViewSynthesis

        rvs = RightViewSynthesis(output_shape=(384, 1280))
        assert tuple(rvs.model_full_shape) == (384, 1280), \
            "bench assumes the committed native 384x1280 Deep3D checkpoint"
        _E2E_SHARED["rvs_f32"] = rvs
        _E2E_SHARED["host_vars"] = rvs.variables
        _E2E_SHARED["dev_vars"] = jax.device_put(rvs.variables)
    return _E2E_SHARED


def _e2e_single_view_fps(compute_dtype: str = "float32"):
    """The reference's headline scenario end-to-end: ONE left view in,
    disparity out — Deep3D right-view synthesis (trained checkpoint) + the
    classical matcher, composed as a single jitted graph (the reference
    runs this at 30 FPS total; ``README.md:51``).  ``compute_dtype=
    bfloat16`` runs the Deep3D forward on the MXU in bf16."""
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map
    from stereo_tpu.synthesis.right_view_synthesis import (RightViewSynthesis,
                                                           synthesize_batch)

    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    shared = _e2e_shared()
    rvs = (shared["rvs_f32"] if compute_dtype == "float32"
           else RightViewSynthesis(output_shape=(384, 1280),
                                   compute_dtype=compute_dtype,
                                   variables=shared["host_vars"]))
    dtype = jnp.dtype(compute_dtype)

    rng = np.random.default_rng(2)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    ld = jax.device_put(jnp.asarray(left))
    # the ONE device-resident weight pytree, shared across arms
    variables = shared["dev_vars"]

    if rvs.split_inference:
        # Production TPU path (pipeline/single_view.py): TWO chained
        # executables — the pure-XLA Deep3D net (Mosaic-free so XLA keeps
        # its latency hiding; see right_view_synthesis.py), then ONE merged
        # Pallas blend-tail + Pallas matcher executable.  The old
        # 3-executable chain measured 124-240 FPS with wild per-dispatch
        # scheduling variance; the merged chain is ~235 FPS and stable
        # (scripts/exp_chain_merge.py).  Measured with the dispatch-slope
        # protocol since the chain crosses executables.
        from stereo_tpu.pipeline.single_view import FusedSingleViewEngine

        engine = FusedSingleViewEngine(cfg, rvs)
        perturb = jax.jit(lambda i: jnp.clip(
            ld + i * jnp.float32(1e-3), 0.0, 255.0))

        def chain(left_dev):
            left = left_dev[None]
            prob_low, full01 = engine._fn_net(variables, left)
            return engine._fn_tail_match(prob_low, full01, left)[0]

        return _chained_slope_fps(
            chain, lambda i: perturb(jnp.float32(i)))

    # Non-TPU fallback: the one-graph composition, in-graph protocol.
    # Weights MUST be jit arguments, not a closure: closed-over weights
    # become HLO constants, and the ~170 MB body blows the remote compile
    # server's request-size limit (HTTP 413).
    def frame(left, variables):
        right = synthesize_batch(rvs.model, variables, left[None],
                                 output_shape=(384, 1280),
                                 full_shape=rvs.model_full_shape,
                                 down_shape=rvs.model_down_shape,
                                 compute_dtype=dtype)[0]
        return compute_disparity_map(left, right, cfg)

    return _single_m_fps(frame, (ld, variables), m=50)


def _e2e_one_module_fps():
    """The single-view scenario as ONE jitted module (synthesize_batch +
    classical matcher), timed with the in-graph marginal protocol — see the
    worker's comment for how this relates to the primary chain metric."""
    import jax
    import jax.numpy as jnp

    from stereo_tpu.core.config import MatchingConfig
    from stereo_tpu.matching.classical import compute_disparity_map
    from stereo_tpu.synthesis.right_view_synthesis import synthesize_batch

    cfg = MatchingConfig(height=384, width=1280, min_disparity=0,
                         max_disparity=64)
    shared = _e2e_shared()
    rvs = shared["rvs_f32"]
    rng = np.random.default_rng(2)
    left = np.round(rng.uniform(0, 255, (3, 384, 1280))).astype(np.float32)
    ld = jax.device_put(jnp.asarray(left))
    variables = shared["dev_vars"]

    def frame(l, v):
        right = synthesize_batch(rvs.model, v, l[None],
                                 output_shape=(384, 1280),
                                 full_shape=rvs.model_full_shape,
                                 down_shape=rvs.model_down_shape)[0]
        return compute_disparity_map(l, right, cfg)

    fps, _, _ = _marginal_fps(frame, (ld, variables), m_small=8, m_large=40)
    return fps


def _dnn_fps(model_name: str, extra: dict, compute_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp

    from stereo_tpu.pipeline.backends import DnnStereoMatchingBackend

    # msnet2d's interlaced cost volume folds D into channel dims, so its
    # committed checkpoint is bound to the D=64 it was trained at (KITTI's
    # advertised range); gwcnet/msnet3d weights are D-independent and bench
    # at the standard 192 planes.
    max_disparity = 64 if model_name == "msnet2d" else 192
    backend = DnnStereoMatchingBackend(model_name, image_shape=(384, 1280),
                                       max_disparity=max_disparity,
                                       compute_dtype=compute_dtype)
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (1, 3, 384, 1280)), jnp.float32))
    # params as a device-resident argument, not a closure — closed-over
    # weights become HLO constants and bloat the remote-compile upload, and
    # host-side numpy params would re-cross the tunnel every call.
    params = jax.device_put(backend.params)
    return _single_m_fps(lambda l, r, p: backend._forward(p, l, r),
                         (x, x, params), m=50)


def _metric_key(job: str, dtype: str) -> str:
    base = ("e2e_single_view" if job == "e2e_single_view"
            else "middlebury_1080p_pallas" if job == "middlebury" else job)
    suffix = "_bf16_fps" if dtype == "bfloat16" else "_fps"
    return base + suffix


def _worker(job: str, dtypes_csv: str) -> None:
    """Subprocess entry: measure one metric FAMILY (all its dtype arms in
    one process — jax/tunnel init and model construction are shared, which
    matters for the driver's wall budget), printing one keyed line per
    arm."""
    _enable_compile_cache()
    for dtype in dtypes_csv.split(","):
        key = _metric_key(job, dtype)
        if job == "middlebury":
            # fps FIRST (the headline Pallas evidence), gate second: a
            # job-cap kill during the gate's extra compile then still
            # leaves the fps in the record (main parses partial stdout).
            print("WORKER_KEY", key, _middlebury_fps(), flush=True)
            golden_frac = _middlebury_golden_frac()
            if golden_frac is not None:
                print("WORKER_GOLDEN_FRAC", golden_frac, flush=True)
                assert golden_frac >= 0.99, (
                    f"Pallas demo disparity drifted: only {golden_frac:.4f} "
                    f"of pixels within 0.5px of the committed TPU golden")
        elif job == "e2e_single_view":
            print("WORKER_KEY", key,
                  _e2e_single_view_fps(compute_dtype=dtype), flush=True)
            if dtype == "float32":
                # Secondary evidence, printed AFTER the primary so a kill
                # during its extra compile never loses that number: the
                # one-module composition timed IN-GRAPH (lax.map over M
                # frames, single dispatch — the same amortized protocol the
                # DNN metrics use).  This is the chip's sustained device
                # throughput with the tunnel's ~0.3 ms/execution
                # serialization amortized out; the primary chain number
                # keeps that overhead (real per-frame cost on this
                # transport).  The 2-executable chain has LOWER device time
                # (~2.9 vs ~3.3 ms — the one-module graph pays the Mosaic
                # co-compile penalty) but cannot be measured in-graph
                # because it crosses executables.
                print("WORKER_KEY e2e_single_view_device_fps",
                      _e2e_one_module_fps(), flush=True)
        else:
            print("WORKER_KEY", key,
                  _dnn_fps(job, {}, compute_dtype=dtype), flush=True)


def main() -> None:
    import subprocess

    _enable_compile_cache()
    start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 540))
    # The classical headline (compile cached in bench_cache/ + ~30s
    # measurement) always gets this reserved tail; everything before it is
    # killable.
    classical_reserve_s = 120.0
    extra: dict = {}

    # Secondary metrics FIRST, in killable subprocesses (remote-compile
    # latency varies 30s..10+min; the headline must still always print).
    # Cheapest-to-compile first: the Middlebury Pallas metric compiles in
    # ~1 min and must not be starved by a pathological DNN remote compile.
    # One subprocess per metric FAMILY — both dtype arms share jax/tunnel
    # init and model construction (measured ~15-25 s per process), and the
    # fp32 arm prints before the bf16 arm compiles, so a cap kill loses at
    # most the second arm (VERDICT r3 #2); msnet2d (a secondary fp32
    # metric with no bf16 twin and no reference baseline) is the
    # sacrificial last job.
    jobs = [("middlebury", ["float32"]),
            ("gwcnet", ["float32", "bfloat16"]),
            ("e2e_single_view", ["float32", "bfloat16"]),
            ("msnet3d", ["float32", "bfloat16"]),
            ("msnet2d", ["float32"])]
    baselines = {"gwcnet_fps": ("gwcnet", 6.0),
                 "e2e_single_view_fps": ("e2e_single_view", 30.0),
                 "msnet3d_fps": ("msnet3d", 4.0)}
    # Per-job cap: one pathological remote compile must not starve every
    # later metric (the committed bench_cache/ makes driver runs warm, and
    # a killed worker still leaves its compile in the cache for next time).
    job_cap_s = float(os.environ.get("BENCH_JOB_CAP_S", 270))

    def harvest(stdout: str):
        for line in (stdout or "").splitlines():
            if line.startswith("WORKER_GOLDEN_FRAC"):
                extra["pallas_golden_frac_within_0p5px"] = round(
                    float(line.split()[1]), 4)
            elif line.startswith("WORKER_KEY"):
                _, k, v = line.split()
                extra[k] = round(float(v), 2)
                if k in baselines:
                    name, base = baselines[k]
                    extra[f"{name}_vs_baseline"] = round(float(v) / base, 2)

    for name, dtypes in jobs:
        keys = ", ".join(_metric_key(name, d) for d in dtypes)
        remaining = min(job_cap_s,
                        budget_s - (time.perf_counter() - start)
                        - classical_reserve_s)
        if remaining < 45:
            print(f"bench: skipping {keys} (wall budget)", file=sys.stderr)
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 name, ",".join(dtypes)],
                capture_output=True, text=True, timeout=remaining,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            harvest(proc.stdout)
            if proc.returncode != 0:
                # A worker crash must be LOUD in the record, not a silently
                # absent key: the middlebury worker's exit-1 is the Pallas
                # golden gate itself (semantic regression), and any other
                # crash is a broken engine.  Keep the one-JSON-line contract
                # but carry the evidence.
                tail = [ln for ln in proc.stderr.strip().splitlines()
                        if ln and "WARNING" not in ln][-3:]
                extra.setdefault("job_errors", {})[keys] = " | ".join(tail)
                print(f"bench: {keys} worker exited {proc.returncode}:",
                      file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
        except subprocess.TimeoutExpired as exc:
            # Keep whatever the worker reported before the cap (e.g. the
            # fp32 arm measured before the bf16 arm's compile).
            out = exc.stdout
            harvest(out.decode() if isinstance(out, bytes) else out)
            extra.setdefault("job_errors", {})[keys] = "job cap timeout"
            print(f"bench: {keys} timed out", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            extra.setdefault("job_errors", {})[keys] = str(exc)[:200]
            print(f"bench: {keys} failed: {exc}", file=sys.stderr)

    classical = _classical_fps(extra)

    result = {
        "metric": "classical_stereo_fps_per_chip_kitti_384x1280_d64",
        "value": round(classical, 2),
        "unit": "frames/s",
        "vs_baseline": round(classical / 30.0, 3),
        **extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "float32")
    else:
        main()

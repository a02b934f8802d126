"""Structural MXU roofline for the GwcNet-class backends (VERDICT r4 #2).

The 3-D aggregation networks run at 32/64/128 channels.  On the v5e MXU
the lane (output-channel) dimension is 128 wide, so a conv's peak
utilization is structurally capped by how full its lane dimension is —
and the ``conv3d_chunked`` reformulation (``ops/conv3d.py``) trades FLOP
overhead for lane fill: cout=32 packs db=4 disparity planes into the
lanes (100% fill) at span/3 = 2x redundant FLOPs, i.e. an effective 50%
ceiling on MATHEMATICAL flops; cout=64 -> 4/3 overhead -> 75%; cout>=128
runs native at ~100%.

This script walks the eval forward graph with ``jax.eval_shape``-level
bookkeeping (no device needed), tags every conv/deconv/matmul with its
mathematical flops and its structural lane ceiling, and emits the
flop-weighted ceiling:

    ceiling_MFU = sum(flops) / sum(flops / util_i)

which is the best MFU ANY scheduler could reach with this architecture,
layout strategy, and datatype — before accounting for BN/elementwise
bandwidth, volume construction, resampling, and inter-op gaps.  Compare
against the measured MFU (``results/bench/mfu_r05.json``) to separate
"structurally impossible" from "left on the table".

Writes ``results/bench/roofline_gwcnet_r05.json``.

Usage: JAX_PLATFORMS=cpu python scripts/roofline_gwcnet.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 1280
LANES = 128


def conv_util(cout: int, kind: str = "conv3d", stride: int = 1) -> float:
    """Structural ceiling (fraction of MXU peak on mathematical flops) for
    the layout each op actually uses (``ops/conv3d.py`` dispatch)."""
    if kind in ("conv2d", "matmul"):
        return min(cout, LANES) / LANES
    if kind == "deconv3d":
        # deconv3d_parity splits into stride^3 phase convs with cout lanes
        # each (no structural-zero MACs) — lane fill = cout/128 per phase.
        return min(cout, LANES) / LANES
    # conv3d dispatch: cout==1 -> shiftadd (kd*cout = 3 lanes, zero FLOP
    # overhead); cout<128 -> chunked (full lanes, (db+2)/3 redundancy at
    # stride 1, (2db+2)/3 at stride 2 over span = s*(db-1)+3)
    if cout == 1:
        return 3 / LANES
    if cout < LANES:
        db = max(1, LANES // cout)
        span = stride * (db - 1) + 3
        return (db * cout / LANES) * (3.0 / span) * (1 if stride == 1 else 1)
    return 1.0


def gwcnet_ops():
    """(name, mathematical GFLOPs, util) for every MXU op of the eval
    forward at the benched config (384x1280, D=192, batch 1, both views)."""
    ops = []
    h2, w2 = H // 2, W // 2
    h4, w4 = H // 4, W // 4
    d4 = 192 // 4

    def conv2d(name, px, cin, cout, k=3, views=1):
        gf = px * k * k * cin * cout * 2 * views / 1e9
        ops.append((name, gf, conv_util(cout, "conv2d")))

    # feature extractor (siamese: batch 2 == views 2)
    conv2d("fe.conv0_a", h2 * w2, 3, 32, views=2)
    conv2d("fe.conv0_b", h2 * w2, 32, 32, views=2)
    conv2d("fe.conv0_c", h2 * w2, 32, 32, views=2)
    for i in range(3):
        conv2d(f"fe.layer1.{i}", h2 * w2, 32, 32, views=2)
        conv2d(f"fe.layer1.{i}b", h2 * w2, 32, 32, views=2)
    conv2d("fe.layer2.0a", h4 * w4, 32, 64, views=2)
    conv2d("fe.layer2.0b", h4 * w4, 64, 64, views=2)
    conv2d("fe.layer2.0ds", h4 * w4, 32, 64, k=1, views=2)
    for i in range(1, 16):
        conv2d(f"fe.layer2.{i}a", h4 * w4, 64, 64, views=2)
        conv2d(f"fe.layer2.{i}b", h4 * w4, 64, 64, views=2)
    conv2d("fe.layer3.0a", h4 * w4, 64, 128, views=2)
    conv2d("fe.layer3.0b", h4 * w4, 128, 128, views=2)
    conv2d("fe.layer3.0ds", h4 * w4, 64, 128, k=1, views=2)
    for i in range(1, 3):
        conv2d(f"fe.layer3.{i}a", h4 * w4, 128, 128, views=2)
        conv2d(f"fe.layer3.{i}b", h4 * w4, 128, 128, views=2)
    for i in range(3):
        conv2d(f"fe.layer4.{i}a", h4 * w4, 128, 128, views=2)
        conv2d(f"fe.layer4.{i}b", h4 * w4, 128, 128, views=2)

    # gwc volume: per disparity, C=320 elementwise + (C,G) matmul
    vol_px = d4 * h4 * w4
    ops.append(("volume.gwc_matmul", vol_px * 320 * 40 * 2 / 1e9,
                conv_util(40, "matmul")))

    def conv3d(name, vox, cin, cout, stride=1):
        gf = vox * 27 * cin * cout * 2 / 1e9
        ops.append((name, gf, conv_util(cout, "conv3d", stride)))

    def deconv3d(name, out_vox, cin, cout):
        gf = out_vox * 8 * cin * cout * 2 / 1e9   # 4^3 kernel, stride 2
        ops.append((name, gf, conv_util(cout, "deconv3d")))

    vox1 = d4 * h4 * w4
    vox2 = vox1 // 8
    vox3 = vox1 // 64
    conv3d("pre.0", vox1, 40, 32)
    conv3d("pre.1", vox1, 32, 32)
    conv3d("pre.2", vox1, 32, 32)
    conv3d("pre.3", vox1, 32, 32)
    for g in range(3):
        conv3d(f"hg{g}.c1", vox2, 32, 64, stride=2)
        conv3d(f"hg{g}.c2", vox2, 64, 64)
        conv3d(f"hg{g}.c3", vox3, 64, 128, stride=2)
        conv3d(f"hg{g}.c4", vox3, 128, 128)
        deconv3d(f"hg{g}.up1", vox2, 128, 64)
        deconv3d(f"hg{g}.up2", vox1, 64, 32)
    conv3d("classif.conv", vox1, 32, 32)
    conv3d("classif.head", vox1, 32, 1)
    return ops


def main() -> None:
    ops = gwcnet_ops()
    total_gf = sum(g for _, g, _ in ops)
    time_units = sum(g / u for _, g, u in ops)
    ceiling = total_gf / time_units

    groups = {}
    for name, g, u in ops:
        key = name.split(".")[0]
        e = groups.setdefault(key, {"gflops": 0.0, "time_units": 0.0})
        e["gflops"] += g
        e["time_units"] += g / u
    for e in groups.values():
        e["effective_util"] = round(e["gflops"] / e["time_units"], 3)
        e["gflops"] = round(e["gflops"], 1)
        e["time_units"] = round(e["time_units"], 1)
        e["time_share_pct"] = round(100 * e["time_units"] / time_units, 1)

    out = {
        "config": {"image": [H, W], "max_disparity": 192, "batch": 1,
                   "dtype_note": "utilization ceilings are dtype-agnostic; "
                                 "fp32 additionally pays the 3x bf16x3 "
                                 "MXU passes (MFU here is measured against "
                                 "the bf16 peak for both)"},
        "model_gflops_math": round(total_gf, 1),
        "structural_ceiling_mfu": round(ceiling, 4),
        "meaning": "flop-weighted lane-occupancy ceiling of the deployed "
                   "conv lowerings (ops/conv3d.py dispatch): the best MFU "
                   "any schedule could reach before BN/elementwise "
                   "bandwidth, volume build, trilinear upsample+softmax "
                   "head, and inter-op bubbles",
        "groups": groups,
        "per_op_worst_time_shares": sorted(
            [{"op": n, "gflops": round(g, 1), "util": round(u, 3),
              "time_share_pct": round(100 * (g / u) / time_units, 1)}
             for n, g, u in ops], key=lambda r: -r["time_share_pct"])[:10],
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "results", "bench", "roofline_gwcnet_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("model_gflops_math", "structural_ceiling_mfu")},
                     indent=1))
    for k, e in sorted(groups.items(), key=lambda kv: -kv[1]["time_units"]):
        print(f"{k:10s} {e['gflops']:7.1f} GF  util {e['effective_util']:.3f}"
              f"  time {e['time_share_pct']:.1f}%")
    print("wrote", path)


if __name__ == "__main__":
    main()

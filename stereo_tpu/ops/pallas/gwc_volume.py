"""Fused group-wise-correlation volume build — a MEASURED NEGATIVE RESULT.

NOT wired into any model; preserved (like the losing conv3d formulations
in ``ops/conv3d.py``) so the next round doesn't re-attempt it blind.

Hypothesis: the XLA build (``models/cost_volumes.py::build_gwc_volume``)
emits one einsum per disparity plane, re-reading the full left feature map
per plane (~1 GB of reads at the bench config, D=48, 96x320x320) — and the
gwcnet executables measure AT the HBM roof, so a VMEM-resident build
(read features once, compute all D planes in-kernel) should be wall-clock
faster.

Measurement (v5e, 2026-08-21).  Isolated build (``scripts/
microbench_gwc_volume.py``, lax.map marginal protocol): Pallas 14.1 ms
vs XLA 16.3 ms fp32 — the kernel narrowly wins in isolation (the 4.35 ms
the per-stage profile reports for the XLA build is protocol-dependent).
DECISIVE full-graph A/B (``scripts/exp_gwc_volume_fullgraph.py``, the
whole gwcnet ``_forward``): **XLA 56.5 ms vs Pallas 58.8 ms per frame
(bf16)** — deploying the kernel makes the backend 4% SLOWER: the Mosaic
co-compile penalty (a custom call costs XLA's latency hiding for
co-compiled ops) plus the kernel's relayout overhead outweigh the traffic
it saves.  Why the kernel itself is slow (h_block=2 is the only
configuration that both compiles and fits VMEM):

* Mosaic cannot prove alignment of data-dependent sublane starts, so the
  disparity shifts must be STATIC slices — the whole D loop unrolls in
  one kernel invocation per h-block, and each of the 48 unaligned
  sublane-offset slices of the right slab pays a relayout;
* the unrolled ``left * shifted`` intermediates blow the 16 MB scoped
  VMEM default (needs ``vmem_limit_bytes=100MB``) and cap ``h_block`` at
  2, leaving M=640 matmuls that underfill the MXU;
* h_block=8 fails to compile at all (VMEM), and a (h, d)-grid variant
  with VMEM-resident slabs is impossible without dynamic sublane slices.

Same conclusion as the r3 Pallas conv3d attempt: Mosaic relayout cost on
shift-structured access beats the HBM traffic it saves.  The XLA build
(3.1x over naive slice/pad/stack) stays deployed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_BLOCK = 2


def _kernel(left_ref, rp_ref, gmean_ref, out_ref, *, max_disparity: int,
            highest: bool):
    # Every disparity is a STATIC sublane-offset slice of the padded right
    # slab (Mosaic cannot prove alignment of data-dependent sublane
    # starts), so the full D loop unrolls here and the slab loads once per
    # h-block.
    left = left_ref[:]                                   # (Hb, W, C)
    rp = rp_ref[:]                                       # (Hb, W + D, C)
    gmean = gmean_ref[:]                                 # (C, G)
    w = left.shape[1]
    prec = jax.lax.Precision.HIGHEST if highest else None
    for d in range(max_disparity):
        shifted = rp[:, max_disparity - d:max_disparity - d + w, :]
        # fp32 accumulation (Mosaic requires a 32-bit matmul acc); cast to
        # the volume dtype on store.
        out_ref[d] = jax.lax.dot_general(
            left * shifted, gmean, (((2,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _build_one(left_hwc, rp_hwc, gmean, max_disparity, interpret):
    h, w, c = left_hwc.shape
    g = gmean.shape[1]
    h_block = min(H_BLOCK, h)
    while h % h_block:
        h_block -= 1
    kernel = functools.partial(_kernel, max_disparity=max_disparity,
                               highest=left_hwc.dtype == jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(h // h_block,),
        in_specs=[
            pl.BlockSpec((h_block, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_block, w + max_disparity, c),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((max_disparity, h_block, w, g),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((max_disparity, h, w, g),
                                       left_hwc.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(left_hwc, rp_hwc, gmean)


def build_gwc_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                            max_disparity: int, num_groups: int,
                            interpret: bool = False) -> jnp.ndarray:
    """(N, H, W, C) feature pairs -> (N, D, H, W, G) group-correlation
    volume; same math as ``models.cost_volumes.build_gwc_volume``."""
    n, h, w, c = left.shape
    cpg = c // num_groups
    gmean = (jnp.repeat(jnp.eye(num_groups, dtype=left.dtype), cpg, axis=0)
             / cpg)
    rp = jnp.pad(right, ((0, 0), (0, 0), (max_disparity, 0), (0, 0)))
    build = functools.partial(_build_one, gmean=gmean,
                              max_disparity=max_disparity,
                              interpret=interpret)
    return jax.vmap(build)(left, rp)

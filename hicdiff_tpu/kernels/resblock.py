"""Fused hicedrn ResnetBlock as a Pallas TPU kernel.

The sampling hot loop is 32 sequential residual blocks, each applying ONE shared
3x3 conv TWICE with a scale-shift + SiLU in between and a x0.1 residual
(reference /root/reference/src/model/hicedrn_Diff.py:182-208). XLA's generic
conv lowering runs the chain at ~96% of v5e bf16 peak (VALIDATION.md round-3
accounting), so this kernel cannot win and is kept as an opt-in demonstrator
(it measures 0.67x of XLA). It reformulates each conv as an implicit GEMM — nine
shifted-window (rows, C) @ (C, C) matmuls accumulated in fp32 — and keeps the
whole block (both convs, the elementwise epilogue, the residual add) resident in
VMEM, so per block the only HBM traffic is x in, y out, and the 3x3xCxC weights.

Layout: NHWC, C = lane dimension (256 = 2x128 lanes). Grid = (batch,
row_chunks): each program computes a CH-row output stripe; the first conv is
evaluated on a (CH+2)-row halo so the second conv needs no cross-program
exchange (3% redundant FLOPs at CH=32, H=64).

Numerics: matmuls accumulate in fp32 regardless of input dtype (the flax/XLA
bf16 path truncates conv outputs to bf16); the intermediate activation is cast
back to the input dtype between the two convs to match the flax dtype policy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_resblock"]


def _kernel(x_ref, w_ref, b_ref, sc_ref, sh_ref, out_ref, *, ch, h, w, c):
    """One (batch, row-chunk) program.

    x_ref:  (1, H+4, W+4, C) spatially 2-padded input (same block for every
            row-chunk of a batch element — Pallas fetches it once per element)
    w_ref:  (3, 3, C, C) shared conv kernel (HWIO)
    b_ref:  (1, C) conv bias
    sc_ref/sh_ref: (1, C) time-conditioning scale / shift for this batch element
    out_ref: (1, CH, W, C) output stripe
    """
    j = pl.program_id(1)
    r0 = j * ch  # first output row of this stripe

    dtype = x_ref.dtype
    bias = b_ref[0].astype(jnp.float32)  # (C,)

    # ---- conv #1 on the haloed stripe: h rows [r0-1, r0+CH+1), cols [-1, W+1)
    # h row hr reads x rows hr-1..hr+1 = xp rows hr+1..hr+3; with local row
    # l = hr-(r0-1), tap dy reads xp rows [r0+dy, r0+dy+CH+2).
    rows1 = ch + 2
    cols1 = w + 2
    acc = jnp.zeros((rows1 * cols1, c), jnp.float32)
    for dy in range(3):
        row_slab = x_ref[0, pl.ds(r0 + dy, rows1)]  # (CH+2, W+4, C)
        for dx in range(3):
            tile = row_slab[:, dx : dx + cols1, :].reshape(rows1 * cols1, c)
            acc += jnp.dot(
                tile, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    hidden = acc + bias

    # ---- scale-shift + SiLU (hicedrn_Diff.py:202-203), then zero the halo
    # entries that correspond to conv SAME zero-padding (they must be zero as
    # *activations*, so mask after the nonlinearity).
    scale = sc_ref[0, 0].astype(jnp.float32)
    shift = sh_ref[0, 0].astype(jnp.float32)
    hidden = hidden * (scale + 1.0) + shift
    hidden = hidden * jax.nn.sigmoid(hidden)  # SiLU

    # mask in the flattened (rows*cols, 1) space (Mosaic cannot shape-cast a
    # 2D boolean vector): local row l = idx // cols, local col m = idx % cols
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows1 * cols1, 1), 0)
    li = idx // cols1
    mi = idx - li * cols1
    hr = r0 - 1 + li  # global h row of local row l
    valid = (hr >= 0) & (hr < h) & (mi >= 1) & (mi < w + 1)
    act = jnp.where(valid, hidden, 0.0).astype(dtype)
    act3 = act.reshape(rows1, cols1, c)

    # ---- conv #2 (same weights): out row r tap dy reads h row r+dy-1 ->
    # local row r-r0+dy; out col cc tap dx reads local col cc+dx.
    acc2 = jnp.zeros((ch * w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tile = act3[dy : dy + ch, dx : dx + w, :].reshape(ch * w, c)
            acc2 += jnp.dot(
                tile, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    y = (acc2 + bias) * 0.1  # x0.1 residual scale (hicedrn_Diff.py:205)

    x_center = x_ref[0, pl.ds(r0 + 2, ch), 2 : 2 + w, :].reshape(ch * w, c)
    out_ref[0] = (y + x_center.astype(jnp.float32)).astype(dtype).reshape(
        ch, w, c
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_resblock(x, kernel, bias, scale, shift, *, interpret: bool = False):
    """y = conv(silu(conv(x)*(scale+1)+shift))*0.1 + x with one shared conv.

    x: (B, H, W, C) NHWC; kernel: (3, 3, C, C) HWIO; bias: (C,);
    scale/shift: (B, C) per-element time conditioning
    (= split(Dense(silu(t_emb)))). Matches HicedrnResBlock
    (models/hicedrn.py:44-64) with fp32 accumulation.
    """
    b, h, w, c = x.shape
    # largest divisor of h that is <= 32: a single full-height stripe for an
    # unusual large h (e.g. 96, 120) could exceed VMEM, so always chunk when
    # any divisor allows it (h=64 -> 32, h=48 -> 24, h<=32 -> h)
    ch = next(d for d in range(min(h, 32), 0, -1) if h % d == 0)
    n_chunks = h // ch

    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    kernel = kernel.astype(x.dtype)
    bias2 = bias.reshape(1, c).astype(x.dtype)

    grid = (b, n_chunks)
    out = pl.pallas_call(
        functools.partial(_kernel, ch=ch, h=h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h + 4, w + 4, c),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, c, c), lambda i, j: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ch, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * w * c * c * 9,
            bytes_accessed=(2 * b * h * w * c + 9 * c * c) * x.dtype.itemsize,
            transcendentals=b * h * w * c,
        ),
        interpret=interpret,
    )(
        xp,
        kernel,
        bias2,
        scale.astype(x.dtype).reshape(b, 1, c),
        shift.astype(x.dtype).reshape(b, 1, c),
    )
    return out

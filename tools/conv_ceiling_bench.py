"""Hardware evidence for the conv-ceiling conclusion (VALIDATION.md round 3).

The sampling chain is 99.9% conv time (profile), and XLA's conv lowering for
the backbone's (64x64x256, 3x3) shape runs at ~96% of the v5e's 197 TFLOP/s
bf16 peak. This bench reproduces the three measurements behind that claim:

  1. isolated conv per-op time, NHWC vs NCHW, with/without a SiLU epilogue —
     dispatch-amortized by chaining K=100 data-dependent ops in one lax.scan
     (the tunneled backend adds ~1 ms per dispatch, so single-op timings at
     this scale are meaningless);
  2. a pure 8192^3 bf16 matmul — the MXU's best case — as the empirical
     achievable-peak yardstick;
  3. the device kind, so the right spec-sheet peak is used (v5e = "TPU v5
     lite": 197 TFLOP/s bf16; its 394 figure is int8 TOPS).

Usage: python tools/conv_ceiling_bench.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from hicdiff_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H = W = 64
C = 256
K = 100

print("device:", jax.devices()[0].device_kind)

rng = jax.random.PRNGKey(0)
x = (jax.random.normal(rng, (B, H, W, C)) * 0.05).astype(jnp.bfloat16)
w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, C, C)) * 0.01).astype(
    jnp.bfloat16
)


def chain(op):
    @jax.jit
    def f(x, w):
        def body(h, _):
            return op(h, w), None

        out, _ = lax.scan(body, x, None, length=K)
        return out

    return f


def op_conv(h, w, dn=("NHWC", "HWIO", "NHWC")):
    return lax.conv_general_dilated(h, w, (1, 1), "SAME", dimension_numbers=dn)


def timeit(f, *args, n=5):
    o = f(*args)
    _ = float(jnp.asarray(o).ravel()[0])  # real fetch: see CLAUDE.md timing rule
    t0 = time.time()
    for _ in range(n):
        o = f(*args)
    _ = float(jnp.asarray(o).ravel()[0])
    return (time.time() - t0) / n / K


gflop = 2 * B * H * W * 9 * C * C / 1e9
xn = jnp.transpose(x, (0, 3, 1, 2))
cases = [
    ("conv nhwc     ", lambda h, w: op_conv(h, w), x),
    ("conv nchw     ", lambda h, w: op_conv(h, w, ("NCHW", "HWIO", "NCHW")), xn),
    ("conv nhwc+silu", lambda h, w: jax.nn.silu(op_conv(h, w)), x),
]
for name, op, inp in cases:
    dt = timeit(chain(op), inp, w)
    print(f"{name} B={B}: {dt*1e3:7.3f} ms/conv  {gflop/dt/1e3:6.1f} TFLOP/s")

N = 8192
a = (jax.random.normal(rng, (N, N)) * 0.01).astype(jnp.bfloat16)
b = (jax.random.normal(jax.random.PRNGKey(2), (N, N)) * 0.01).astype(jnp.bfloat16)


@jax.jit
def mm(a, b):
    def body(h, _):
        return (jnp.dot(h, b) * 0.01).astype(jnp.bfloat16), None

    out, _ = lax.scan(body, a, None, length=30)
    return out


o = mm(a, b)
_ = float(o[0, 0])
t0 = time.time()
for _ in range(5):
    o = mm(a, b)
_ = float(o[0, 0])
dt = (time.time() - t0) / 5 / 30
print(f"matmul {N}^3 bf16: {dt*1e3:.3f} ms  {2*N**3/1e12/dt:.1f} TFLOP/s")

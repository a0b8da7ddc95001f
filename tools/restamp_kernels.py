"""One-shot on-chip re-stamp of every Pallas kernel's parity (VERDICT r2
Next #6): the kernel tests skip off-TPU, so their claims are only as fresh
as the last hardware session. Run this in an alive tunnel window and paste
the output block into BENCH_NOTES "Kernel parity on hardware".

Usage: timeout 1200 python tools/restamp_kernels.py
Prints one markdown-ready block; exits nonzero on any parity failure.
"""
from __future__ import annotations

import datetime
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/some_tpu_jax_cache")

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        print("not a TPU backend; refusing to stamp", file=sys.stderr)
        return 2

    rng = np.random.default_rng(99)
    lines = [f"re-stamp {datetime.date.today().isoformat()} on "
             f"{jax.devices()[0].device_kind}:"]
    failures = 0

    # 1. flash vs XLA attention, both dtypes, current defaults (bq=1024)
    from some_tpu.ops.attention import dot_product_attention
    for T in (512, 1024):
        for dtype in (jnp.float32, jnp.bfloat16):
            B, H, D = 2, 4, 64
            q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
            k = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
            v = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype)
            mask = np.ones((B, T), bool)
            mask[1, T * 3 // 5:] = False
            mask = jnp.asarray(mask)
            ref = np.asarray(dot_product_attention(
                q, k, v, mask=mask, impl="xla"), np.float32)
            out = np.asarray(dot_product_attention(
                q, k, v, mask=mask, impl="flash"), np.float32)
            real = np.concatenate(
                [np.abs(out[0] - ref[0]).ravel(),
                 np.abs(out[1, :T * 3 // 5] - ref[1, :T * 3 // 5]).ravel()])
            tol = 2e-3 if dtype == jnp.float32 else 2e-2
            ok = real.max() <= tol
            failures += not ok
            lines.append(
                f"  flash vs xla T={T} {np.dtype(dtype).name}: "
                f"max|d|={real.max():.2e} ({'OK' if ok else 'FAIL'} "
                f"tol {tol:g})")

    # 2. depthwise pallas vs XLA. bf16: both paths round identically ->
    # bit-identity expected (the original on-chip claim). f32: the Pallas
    # kernel accumulates sequentially, XLA's HIGHEST-precision conv may
    # associate differently -> a few f32 ulps, NOT zero. (XLA's DEFAULT
    # precision truncates f32 conv operands to bf16 on the MXU — the ~6e-3
    # "failure" the 2026-08-17 run caught; _xla_depthwise now pins HIGHEST.)
    from some_tpu.ops.depthwise import depthwise_conv1d
    for T, C, K in ((1024, 512, 31), (512, 256, 31)):
        for dtype, tol in ((jnp.bfloat16, 0.0), (jnp.float32, 5e-6)):
            x = jnp.asarray(rng.standard_normal((2, T, C)), dtype)
            w = jnp.asarray(rng.standard_normal((K, C)) * 0.1, dtype)
            ref = np.asarray(depthwise_conv1d(x, w, impl="xla"), np.float32)
            out = np.asarray(depthwise_conv1d(x, w, impl="pallas"),
                             np.float32)
            diff = np.abs(out - ref).max()
            ok = diff <= tol
            failures += not ok
            label = "bit-identical OK" if ok and tol == 0.0 else \
                ("OK" if ok else "FAIL")
            lines.append(f"  depthwise pallas vs xla T={T} C={C} k={K} "
                         f"{np.dtype(dtype).name}: max|d|={diff:.2e} "
                         f"({label} tol {tol:g})")

    # 3. fused LN->FFN->residual kernel vs reference math
    from some_tpu.ops.fused_ffn import fused_ln_ffn_residual
    B, T, C = 2, 512, 512
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(C) * 0.1 + 1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, 4 * C)) * 0.02, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * C, C)) * 0.02, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    def ref_math(x):
        mean = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
        h = jax.nn.silu(h @ w1 + b1) @ w2 + b2
        return x + 0.5 * h

    ref = np.asarray(ref_math(x))
    out = np.asarray(fused_ln_ffn_residual(x, g, b, w1, b1, w2, b2,
                                           res_scale=0.5))
    diff = np.abs(out - ref).max()
    ok = diff <= 5e-4
    failures += not ok
    lines.append(f"  fused LN->FFN->residual B={B} T={T} C={C}: "
                 f"max|d|={diff:.2e} ({'OK' if ok else 'FAIL'} tol 5e-4)")

    print("\n".join(lines))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

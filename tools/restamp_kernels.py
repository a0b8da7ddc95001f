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
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


def main() -> int:
    import some_tpu  # noqa: F401  applies SOME_TPU_PLATFORM before jax init
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

    # 2. depthwise pallas vs XLA. Both paths compute exact-in-f32 products
    # and accumulate in f32, but in different orders (Pallas: sequential
    # taps; XLA HIGHEST conv: its own association), so the pre-round f32
    # values differ by a few f32 ulps. For bf16 outputs a half-ulp boundary
    # case can then flip ONE bf16 bit — the gate is an elementwise 1-bf16-ulp
    # bound, not bit-identity (tol 0.0 was a flaky hardware gate). For f32
    # outputs a small absolute bound covers the association difference.
    # (XLA's DEFAULT precision truncates f32 conv operands to bf16 on the
    # MXU — the ~6e-3 failure the 2026-08-17 run caught; _xla_depthwise now
    # pins HIGHEST, and this stamp re-proves it on chip.)
    from some_tpu.ops.depthwise import depthwise_conv1d
    for T, C, K in ((1024, 512, 31), (512, 256, 31)):
        for dtype in (jnp.bfloat16, jnp.float32):
            x = jnp.asarray(rng.standard_normal((2, T, C)), dtype)
            w = jnp.asarray(rng.standard_normal((K, C)) * 0.1, dtype)
            ref = np.asarray(depthwise_conv1d(x, w, impl="xla"), np.float32)
            out = np.asarray(depthwise_conv1d(x, w, impl="pallas"),
                             np.float32)
            diff = np.abs(out - ref)
            if dtype == jnp.bfloat16:
                # 1 bf16 ulp at each element's magnitude (2^-8 relative),
                # floored at the scale of the smallest meaningful output
                allowed = 2.0 ** -8 * np.maximum(
                    np.maximum(np.abs(ref), np.abs(out)), 1e-3)
                ok = bool((diff <= allowed).all())
                n_diff = int((diff > 0).sum())
                failures += not ok
                lines.append(
                    f"  depthwise pallas vs xla T={T} C={C} k={K} bfloat16: "
                    f"max|d|={diff.max():.2e}, {n_diff}/{diff.size} elems "
                    f"differ ({'OK' if ok else 'FAIL'} tol 1 bf16 ulp)")
            else:
                ok = diff.max() <= 5e-6
                failures += not ok
                lines.append(
                    f"  depthwise pallas vs xla T={T} C={C} k={K} float32: "
                    f"max|d|={diff.max():.2e} ({'OK' if ok else 'FAIL'} "
                    f"tol 5e-06)")

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

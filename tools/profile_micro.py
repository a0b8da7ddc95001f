"""Micro-benchmarks of the conformer's constituent ops at the bench shape.

Each op is applied REPS times as a dependent chain inside ONE jitted program
(lax.scan-style feedback), so per-op cost = wall/REPS is immune to dispatch
overhead and the axon tunnel's async quirks (per-call host timing measured
impossible >1000 TFLOP/s rates; a dependent chain cannot be pipelined away).

Times raw jnp/Pallas pieces at B=32 T=1024 D=512 bf16 so the forward's cost
can be attributed op-by-op against the v5e roofline (197 bf16 TFLOP/s,
~819 GB/s HBM).

Usage: timeout 1200 python tools/profile_micro.py
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np

B, T, D = 32, 1024, 512
HEADS, HD = 8, 64
REPS = 40


def chain_bench(step, x0, reps=REPS, outer=3):
    """step: x -> x (same shape/dtype). Returns seconds per step."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        return jax.lax.scan(lambda c, _: (step(c), None), x,
                            None, length=reps)[0]

    def force(out):
        # the axon backend is LAZY: block_until_ready can return without
        # executing (see CLAUDE.md) — fetching bytes of the result forces
        # the whole dependent chain
        np.asarray(out.ravel()[:1])

    force(run(x0))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        force(run(x0))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (B, T, D), jnp.bfloat16))
    w1 = jax.device_put(jax.random.normal(key, (D, 4 * D), jnp.bfloat16) * 0.02)
    w2 = jax.device_put(jax.random.normal(key, (4 * D, D), jnp.bfloat16) * 0.02)
    wg = jax.device_put(jax.random.normal(key, (D, 2 * D), jnp.bfloat16) * 0.02)
    wsq = jax.device_put(jax.random.normal(key, (D, D), jnp.bfloat16) * 0.02)
    mask = jax.device_put(np.ones((B, T), bool))
    jax.block_until_ready((x, w1, w2, wg, wsq, mask))

    res = {}
    n = B * T

    def report(name, seconds, flops=None, bytes_=None):
        row = {"op": name, "us": round(seconds * 1e6, 1)}
        if flops:
            row["tflops"] = round(flops / seconds / 1e12, 1)
        if bytes_:
            row["GBps"] = round(bytes_ / seconds / 1e9, 1)
        res[name] = seconds * 1e3
        print(json.dumps(row), flush=True)

    # 1. FFN matmul chain: x@W1 -> silu -> @W2 (shape-preserving)
    report("ffn_matmuls",
           chain_bench(lambda c: jax.nn.silu(c @ w1) @ w2, x),
           flops=2 * 2 * n * D * 4 * D)

    # 2. square matmul rate [n,D]@[D,D]
    report("matmul_512x512",
           chain_bench(lambda c: c @ wsq, x),
           flops=2 * n * D * D)

    # 3. layernorm (f32 stats, bf16 out)
    def ln(c):
        cf = c.astype(jnp.float32)
        mu = cf.mean(-1, keepdims=True)
        var = cf.var(-1, keepdims=True)
        return ((cf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
    report("layernorm", chain_bench(ln, x), bytes_=n * D * 2 * 2)

    # 4. flash attention (self-attention on the carry)
    from some_tpu.ops.attention import _flash_attention_bhtd
    q0 = jax.device_put(jax.random.normal(key, (B, HEADS, T, HD), jnp.bfloat16))
    fl_attn = 2 * 2 * B * HEADS * T * T * HD
    report("flash_attn",
           chain_bench(lambda c: _flash_attention_bhtd(c, c, c, mask, HD ** -0.5),
                       q0),
           flops=fl_attn)
    report("flash_attn_nomask",
           chain_bench(lambda c: _flash_attention_bhtd(c, c, c, None, HD ** -0.5),
                       q0),
           flops=fl_attn)

    # 5. XLA attention for comparison (BTHD layout)
    from some_tpu.ops.attention import _xla_attention
    q_bthd = jax.device_put(jax.random.normal(key, (B, T, HEADS, HD), jnp.bfloat16))
    report("xla_attn",
           chain_bench(lambda c: _xla_attention(c, c, c, mask, HD ** -0.5),
                       q_bthd),
           flops=fl_attn)

    # 6. attention projections incl. head-split einsums
    qk = jax.device_put(jax.random.normal(key, (D, HEADS, HD), jnp.bfloat16) * 0.02)
    def proj_step(c):
        q = jnp.einsum("btc,chd->bhtd", c, qk)
        return jnp.swapaxes(q, 1, 2).reshape(B, T, D)
    report("attn_q_proj_roundtrip", chain_bench(proj_step, x),
           flops=2 * n * D * D)

    # 7. depthwise conv (Pallas)
    from some_tpu.ops.depthwise import depthwise_conv1d
    wd = jax.device_put(jax.random.normal(key, (31, D), jnp.bfloat16) * 0.1)
    report("depthwise_pallas",
           chain_bench(lambda c: depthwise_conv1d(c, wd, "pallas"), x),
           bytes_=n * D * 2 * 2)
    report("depthwise_xla",
           chain_bench(lambda c: depthwise_conv1d(c, wd, "xla"), x),
           bytes_=n * D * 2 * 2)

    # 8. GLU gate
    report("glu_gate",
           chain_bench(lambda c: (lambda y: y[..., :D] * jax.nn.sigmoid(y[..., D:]))(c @ wg), x),
           flops=2 * n * D * 2 * D)

    # 9. masked zeroing (per-layer remask)
    report("remask",
           chain_bench(lambda c: jnp.where(mask[..., None], c, 0), x),
           bytes_=n * D * 2 * 2)

    # Reconstruction: 18 blocks x (2FFN + 5LN + attn + proj-ish + conv) + gates
    est = (18 * (2 * res["ffn_matmuls"] + 5 * res["layernorm"]
                 + res["flash_attn"] + 3 * res["attn_q_proj_roundtrip"]
                 + res["depthwise_pallas"] + res["glu_gate"] * 2
                 + res["remask"])
           + 16 * res["glu_gate"])
    print(json.dumps({"reconstructed_fwd_ms": round(est, 1),
                      "parts_ms": {k: round(v, 4) for k, v in res.items()}}))


if __name__ == "__main__":
    main()

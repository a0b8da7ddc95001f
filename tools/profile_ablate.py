"""Attribute the conformer forward's time by component ablation.

Monkeypatches one component class at a time (attention -> zeros, conv module
-> zeros, FFN -> zeros) and re-times the FULL jitted forward at the bench
shape; the delta vs the unmodified forward is that component's true cost
including everything XLA would have fused around it. This sidesteps both
per-dispatch timing noise and XLA's cross-op fusion, which made standalone
micro-benchmarks unattributable on the tunneled backend.

Usage: timeout 1800 python tools/profile_ablate.py
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

B, T = 32, 1024
ITERS = 10


def _force(out):
    """Fetch bytes of the last result — the axon backend is lazy and
    block_until_ready alone may skip execution entirely."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(jax.numpy.ravel(leaves[0])[:1])


def bench(fn, *args, iters=ITERS):
    out = fn(*args)
    _force(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp

    import some_tpu.nn.conformer as conf
    from __graft_entry__ import _flagship_config
    from some_tpu.nn.model import build_midi_extractor

    config = _flagship_config()
    model = build_midi_extractor(config, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 256, config["units_dim"]), np.float32),
        mask=np.ones((1, 256), bool))
    variables = jax.device_put(variables)

    rng = np.random.default_rng(0)
    units = jax.device_put(
        rng.standard_normal((B, T, config["units_dim"])).astype(np.float32))
    mask = jax.device_put(np.ones((B, T), bool))
    jax.block_until_ready((variables, units, mask))

    def fwd_time():
        f = jax.jit(lambda v, u, m: model.apply(v, u, f0=None, mask=m, sig=True))
        return bench(f, variables, units, mask)

    results = {}
    base = fwd_time()
    results["full"] = base
    print(json.dumps({"ablation": "none", "ms": round(base * 1e3, 2)}), flush=True)

    orig_attn = conf.SelfAttention.__call__
    orig_conv = conf.ConvModule.__call__
    orig_ffn = conf.FeedForward.__call__

    def zero_attn(self, x, mask=None):
        return jnp.zeros_like(x)

    def zero_conv(self, x, mask=None, deterministic=True,
                  use_running_average=True):
        return jnp.zeros_like(x)

    def zero_ffn(self, x, deterministic=True):
        return jnp.zeros_like(x)

    for name, cls, patch, orig in (
            ("attention", conf.SelfAttention, zero_attn, orig_attn),
            ("conv_module", conf.ConvModule, zero_conv, orig_conv),
            ("ffn", conf.FeedForward, zero_ffn, orig_ffn)):
        cls.__call__ = patch
        try:
            t = fwd_time()
        finally:
            cls.__call__ = orig
        results[name] = t
        print(json.dumps({"ablation": name, "ms": round(t * 1e3, 2),
                          "component_ms": round((base - t) * 1e3, 2)}),
              flush=True)

    print(json.dumps({
        "base_ms": round(base * 1e3, 2),
        "attn_ms": round((base - results["attention"]) * 1e3, 2),
        "conv_ms": round((base - results["conv_module"]) * 1e3, 2),
        "ffn_ms": round((base - results["ffn"]) * 1e3, 2),
        "rest_ms": round((results["attention"] + results["conv_module"]
                          + results["ffn"] - 2 * base) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()

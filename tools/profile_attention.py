"""Sweep attention kernels/block sizes through the FULL model forward.

Times the whole jitted 8x512 forward (B=32/64, T=1024 bf16) for each
attention configuration — legacy flash vs splash, across block sizes — so
wins are measured in context (XLA fusion, layouts) rather than in isolation.

Usage: timeout 3600 python tools/profile_attention.py
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

T = 1024
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

    from __graft_entry__ import _flagship_config
    from some_tpu.nn.model import build_midi_extractor

    base_config = _flagship_config()
    rng = np.random.default_rng(0)

    variables = None
    results = []

    def run(impl, B, bq=None, bk=None):
        nonlocal variables
        if bq:
            os.environ["SOME_FLASH_BQ" if impl == "flash" else "SOME_SPLASH_BQ"] = str(bq)
        if bk:
            os.environ["SOME_FLASH_BK" if impl == "flash" else "SOME_SPLASH_BK"] = str(bk)
        config = dict(base_config, attention_impl=impl)
        model = build_midi_extractor(config, dtype=jnp.bfloat16)
        if variables is None:
            variables = jax.device_put(model.init(
                jax.random.PRNGKey(0),
                np.zeros((1, 256, config["units_dim"]), np.float32),
                mask=np.ones((1, 256), bool)))
        units = jax.device_put(
            rng.standard_normal((B, T, config["units_dim"])).astype(np.float32))
        mask = jax.device_put(np.ones((B, T), bool))
        jax.block_until_ready((units, mask))
        f = jax.jit(lambda v, u, m: model.apply(v, u, f0=None, mask=m, sig=True))
        try:
            t = bench(f, variables, units, mask)
        except Exception as e:  # noqa: BLE001 — sweep must survive bad configs
            print(json.dumps({"impl": impl, "B": B, "bq": bq, "bk": bk,
                              "error": str(e)[:200]}), flush=True)
            return
        frames_per_ms = B * T / (t * 1e3)
        row = {"impl": impl, "B": B, "bq": bq, "bk": bk,
               "ms": round(t * 1e3, 2),
               "ms_per_32k_frames": round(t * 1e3 * 32768 / (B * T), 2)}
        results.append(row)
        print(json.dumps(row), flush=True)
        # clean env for next config
        for k in ("SOME_FLASH_BQ", "SOME_FLASH_BK",
                  "SOME_SPLASH_BQ", "SOME_SPLASH_BK"):
            os.environ.pop(k, None)

    import sys as _sys
    configs = [("flash", 32, 1024, 1024),  # current default (SOME_FLASH_BQ=1024)
               ("splash", 32, 512, 1024),
               ("splash", 32, 1024, 1024),
               ("flash", 32, 512, 1024)]
    if len(_sys.argv) > 1:  # extra sweep points: impl:B:bq:bk ...
        configs = []
        for spec in _sys.argv[1:]:
            impl, b, bq, bk = spec.split(":")
            configs.append((impl, int(b), int(bq), int(bk)))
    for c in configs:
        run(*c)
    if results:
        best = min(results, key=lambda r: r["ms_per_32k_frames"])
        if len(_sys.argv) == 1:
            run(best["impl"], 64, best["bq"], best["bk"])
            best = min(results, key=lambda r: r["ms_per_32k_frames"])
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()

"""AOT-compile the serving programs for every (rows, frames) bucket.

Production deploys compile ahead of traffic: this walks the frame buckets x
batch-row buckets an engine can hit and populates the persistent XLA compile
cache (JAX_COMPILATION_CACHE_DIR) using abstract ShapeDtypeStructs — no
audio, no device transfers beyond the weights. After this, a fresh serving
process hits only cache loads (seconds) instead of cold compiles (minutes
through a remote compiler).

Usage:
  python tools/warm_cache.py --model ckpt [--buckets 512,768,1024]
                             [--rows 1,2,3,4,6,8,12,16,24,32]
"""
from __future__ import annotations

import argparse
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="checkpoint path")
    ap.add_argument("--buckets", default=None,
                    help="comma-separated frame buckets; default = every "
                         "bucket the engine can serve (DEFAULT_BUCKETS)")
    ap.add_argument("--rows", default=None,
                    help="comma-separated row buckets; default = every row "
                         "bucket <= the engine's max_batch_chunks")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import yaml

    from some_tpu.inference.base_infer import (
        DEFAULT_BATCH_BUCKETS, DEFAULT_BUCKETS, build_inference)

    model_path = pathlib.Path(args.model)
    with open(model_path.with_name("config.yaml"), "r", encoding="utf8") as f:
        config = yaml.safe_load(f)
    engine = build_inference(config, model_path)
    from some_tpu.audio.wire import wire_np_dtype
    wire = jnp.dtype(wire_np_dtype(engine.wire))

    # default to the engine's canonical bucket tables so warming covers every
    # program production can hit (a hardcoded copy would drift)
    buckets = ([int(b) for b in args.buckets.split(",")]
               if args.buckets else list(DEFAULT_BUCKETS))
    row_src = ([int(r) for r in args.rows.split(",")]
               if args.rows else list(DEFAULT_BATCH_BUCKETS))
    # pick_batch_bucket emits table entries below the cap, plus the cap
    # itself — warm exactly that set
    rows = sorted({r for r in row_src if r < engine.max_batch_chunks}
                  | {engine.max_batch_chunks})
    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        engine._device_variables)
    total = 0
    for bucket in buckets:
        for r in rows:
            from some_tpu.audio.wire import wire_width
            n_wire = wire_width(engine.wire, bucket * engine.hop - 1)
            t0 = time.perf_counter()
            engine._pipeline.lower(
                var_shapes,
                jax.ShapeDtypeStruct((r, n_wire), wire),
                jax.ShapeDtypeStruct((r, bucket), jnp.bool_),
            ).compile()
            total += 1
            print(f"| compiled rows={r} frames={bucket} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    print(f"| warmed {total} programs into "
          f"{jax.config.jax_compilation_cache_dir}")


if __name__ == "__main__":
    main()

"""On-chip component timing at the headline bench shape.

Times each stage of the inference pipeline (mel rfft vs dft, conformer
forward with each attention impl, framewise+note decode, full fused
pipeline) with device-resident inputs, printing one JSON line per
measurement. Drives the round-2 MXU-efficiency work (VERDICT.md Next #1).

Usage: timeout 900 python tools/profile_components.py [--lay 8 --dim 512]
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# persistent compile cache: applied by `import some_tpu` via jax.config.update
# (env vars are DEAD on this image — sitecustomize imports jax first; CLAUDE.md)

import numpy as np


def _force(out):
    """Materialize a result on the HOST. The axon backend is lazy:
    block_until_ready can return without executing anything (measured 0.4 ms
    'forwards'); fetching bytes of the last result forces the whole serial
    chain on the single device."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(jax.numpy.ravel(leaves[0])[:1])


def bench_fn(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lay", type=int, default=8)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="",
                    help="comma list: mel,forward,decode,pipeline")
    ap.add_argument("--quant", type=str, default="none")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from some_tpu.inference.me_infer import MIDIExtractionInference
    from some_tpu.nn.model import build_midi_extractor
    from some_tpu.ops.melspec import LogMelSpec

    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    config = _flagship_config(lay=args.lay, dim=args.dim)
    config["quantize"] = args.quant
    model = build_midi_extractor(config, dtype=jnp.bfloat16)
    B, T = args.B, args.T
    hop = config["hop_size"]
    sr = config["audio_sample_rate"]
    n_samples = T * hop - 1
    audio_sec = B * n_samples / sr

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((B, n_samples)).astype(np.float32) * 0.1
    mask_np = np.ones((B, T), bool)

    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 256, config["units_dim"]), np.float32),
        mask=np.ones((1, 256), bool))
    if args.quant == "int8":
        from some_tpu.ops.quant import quantize_params
        new_params, qscales = quantize_params(
            jax.tree.map(np.asarray, variables["params"]))
        variables = {"params": new_params, "qscales": qscales,
                     **{k: v for k, v in variables.items()
                        if k not in ("params", "qscales")}}
    variables = jax.device_put(variables)
    audio_dev = jax.device_put(audio)
    mask = jax.device_put(mask_np)
    jax.block_until_ready((variables, audio_dev, mask))

    results = {}

    def report(name, seconds):
        results[name] = seconds
        print(json.dumps({"stage": name, "ms": round(seconds * 1e3, 2),
                          "rtf": round(audio_sec / seconds, 1)}), flush=True)

    # --- mel ---
    units = None
    for method in ("rfft", "dft"):
        mel = LogMelSpec(
            n_mels=config["units_dim"], sample_rate=sr,
            win_length=config["win_size"], hop_length=hop,
            fmin=config["fmin"], fmax=config["fmax"], method=method,
            dtype=jnp.float32)
        if want("mel"):
            report(f"mel_{method}", bench_fn(mel, audio_dev, iters=args.iters))
        if units is None:
            units = jax.block_until_ready(mel(audio_dev))

    # --- conformer forward ---
    if want("forward"):
        for impl in ("flash", "xla"):
            cfg_i = dict(config, attention_impl=impl)
            model_i = build_midi_extractor(cfg_i, dtype=jnp.bfloat16)
            fwd = jax.jit(lambda v, u, m, m_=model_i: m_.apply(
                v, u, f0=None, mask=m, sig=True))
            report(f"forward_{impl}",
                   bench_fn(fwd, variables, units, mask, iters=args.iters))

    # --- decode ---
    engine = MIDIExtractionInference.from_variables(config, jax.device_get(variables))
    if want("decode"):
        fwd = jax.jit(lambda v, u, m: model.apply(v, u, f0=None, mask=m, sig=True))
        probs, bounds = jax.block_until_ready(fwd(variables, units, mask))
        dec = jax.jit(engine._decode)
        report("decode", bench_fn(dec, probs, bounds, mask, iters=args.iters))

    # --- full pipeline ---
    if want("pipeline"):
        audio_i16 = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
        a16 = jax.device_put(audio_i16)
        report("pipeline",
               bench_fn(lambda a, m: engine._pipeline(engine._device_variables, a, m),
                        a16, mask, iters=args.iters))

    print(json.dumps({"summary": {k: round(v * 1e3, 2) for k, v in results.items()},
                      "audio_sec": round(audio_sec, 1)}), flush=True)


if __name__ == "__main__":
    main()

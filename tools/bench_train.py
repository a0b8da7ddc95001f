"""Training-throughput benchmark on the real chip (force-fetched).

Times the FULL jitted train step (device-side gaussian targets, BCE+EMD
losses, AdamW, grad clip, masked BatchNorm, rematerialized dual-stream
layers) for the flagship 8x512 bf16 model at the reference's batch budget.
Round-1 reported 1.75 s/step at B=32 x T=2048 via block_until_ready; the
axon backend is lazy (CLAUDE.md), so this re-measures with a scalar fetch
forcing every step. The train state is a donated dependency chain, so
fetching the final loss forces the whole sequence.

Usage: timeout 3600 python tools/bench_train.py [--B 32 --T 2048 --steps 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--lay", type=int, default=8)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--remat-policy", type=str, default="nothing")
    ap.add_argument("--rng-impl", type=str, default=None,
                    help="dropout_rng_impl override (threefry2x32 | rbg)")
    ap.add_argument("--force-each", action="store_true",
                    help="fetch every step's loss (not just the last): for "
                    "NON-donated steps (valid_fwd / fwd_loss_only) the 8 "
                    "calls are independent programs, and how the lazy axon "
                    "backend schedules an unforced queue is itself under "
                    "measurement — compare with/without to attribute")
    ap.add_argument("--ablate", type=str, default="none",
                    choices=["none", "no_dropout", "no_bound_loss",
                             "no_midi_loss", "no_clip", "valid_fwd",
                             "valid_fwd_plain", "fwd_loss_only",
                             "grad_only"],
                    help="one-variable train-step ablation: delta vs the "
                    "unmodified step attributes that component's cost "
                    "(same method as tools/profile_ablate.py)")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship_config
    from some_tpu.parallel.mesh import make_mesh, shard_batch
    from some_tpu.training.me_task import MIDIExtractionTask

    config = _flagship_config(lay=args.lay, dim=args.dim)
    config["remat_policy"] = args.remat_policy
    if args.rng_impl:
        config["dropout_rng_impl"] = args.rng_impl
    if args.ablate == "no_dropout":
        for k in ("conv_drop", "ffn_latent_drop", "ffn_out_drop",
                  "attention_drop"):
            config["midi_extractor_args"][k] = 0.0
    elif args.ablate == "no_bound_loss":
        config["use_bound_loss"] = False
    elif args.ablate == "no_midi_loss":
        config["use_midi_loss"] = False
    elif args.ablate == "no_clip":
        config["clip_grad_norm"] = None
    task = MIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    # the trainer always places the state via the mesh (committed
    # NamedSharding arrays); valid-mode ablations must measure that same
    # configuration — make_train_step sets task.mesh as a side effect, but
    # the valid/fwd modes never call it (an earlier round's 10 s/call
    # "validation pathology" was actually HOST-numpy state re-uploading
    # per call because place_state was a silent no-op here)
    task.mesh = mesh
    if args.ablate == "valid_fwd":
        # the full validation step (losses + decode/metric extras)
        valid_step = task.make_valid_step(mesh)
        train_step = lambda state, batch: (state, valid_step(state, batch)[0])  # noqa: E731
    elif args.ablate == "valid_fwd_plain":
        # same forward+losses with the variables device_put ONCE outside
        # the loop (plain jit, no in_shardings) — the discriminator that
        # settled the 10 s/call mystery: HOST-resident args re-upload per
        # call; device-resident args (plain here, NamedSharding-committed
        # in valid_fwd now that task.mesh is set) pass by reference at
        # ~0.03 s. Both legs stay so the comparison is reproducible.
        def _fwd2(params, batch_stats, batch):
            inputs = task.model_inputs(batch)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            outputs = task.model.apply(variables, **inputs)
            losses = task.compute_losses(outputs, batch)
            return dict(losses, total_loss=sum(losses.values()))
        fwd2 = jax.jit(_fwd2)
        placed = None

        def train_step(state, batch):  # noqa: E731
            nonlocal placed
            if placed is None:
                placed = jax.device_put((state.params, state.batch_stats))
            return state, fwd2(placed[0], placed[1], batch)
    elif args.ablate == "fwd_loss_only":
        # forward + losses, nothing else (no grad, no extras): isolates the
        # model forward from valid_outputs' decode/counter tail
        def _fwd(state, batch):
            rng = jax.random.key(config["seed"],
                                 impl=config.get("dropout_rng_impl", "rbg"))
            total, (losses, _) = task._loss_and_updates(
                state.params, state.batch_stats, batch, rng)
            return dict(losses, total_loss=total)
        fwd = jax.jit(_fwd)
        train_step = lambda state, batch: (state, fwd(state, batch))  # noqa: E731
    elif args.ablate == "grad_only":
        # forward + backward + grad-norm, NO optimizer/clip apply: the
        # (full - grad_only) delta is the AdamW update + donation overhead;
        # (grad_only - fwd_loss_only) is the backward pass.
        #
        # Takes (params, batch_stats) — NOT the TrainState. The round-4 leg
        # shipped the whole state and OOM'd at B=32: the Adam moments (2x
        # params) stayed live as unused program inputs while the backward
        # held params + grads + remat boundaries, where the full step's
        # donated state let XLA reuse those buffers. The caller below also
        # DROPS the TrainState after extracting the two trees, so the
        # moments' device buffers are freed before the first grad call.
        def _grad(params, batch_stats, batch):
            rng = jax.random.key(config["seed"],
                                 impl=config.get("dropout_rng_impl", "rbg"))
            grad_fn = jax.value_and_grad(task._loss_and_updates,
                                         has_aux=True)
            (total, (losses, _)), grads = grad_fn(
                params, batch_stats, batch, rng)
            import optax
            return dict(losses, total_loss=total,
                        grad_norm=optax.global_norm(grads))
        grad = jax.jit(_grad)
        train_step = lambda pb, batch: (pb, grad(pb[0], pb[1], batch))  # noqa: E731
    else:
        train_step = task.make_train_step(mesh)

    B, T, N = args.B, args.T, 64
    rng = np.random.default_rng(0)
    batch = {
        "units": rng.standard_normal((B, T, config["units_dim"])).astype(np.float32),
        "pitch": np.zeros((B, T), np.float32),
        "note_midi": rng.uniform(50, 70, (B, N)).astype(np.float32),
        "note_rest": np.zeros((B, N), bool),
        "note_dur": np.full((B, N), T // N, np.int64),
        "note_mask": np.ones((B, N), bool),
        "unit2note": np.repeat(np.arange(1, N + 1), T // N)[None].repeat(B, 0),
        "mask": np.ones((B, T), bool),
        "batch_mask": np.ones((B,), bool),
        "t_real": np.full((1,), T, np.int32),
    }
    state = task.init_state(example_batch=batch)
    state = task.place_state(state)
    if args.ablate == "grad_only":
        # free the optimizer moments (2x params of dead HBM for this leg)
        state = (state.params, state.batch_stats)
    device_batch = shard_batch(batch, mesh)

    state, logs = train_step(state, device_batch)  # compile + warm
    _ = float(logs["total_loss"])                  # force

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, logs = train_step(state, device_batch)
        if args.force_each:
            _ = float(logs["total_loss"])          # force this step now
    _ = float(logs["total_loss"])                  # forces the whole chain
    per_step = (time.perf_counter() - t0) / args.steps

    frames = B * T
    sr_frames = 44100 / config["hop_size"]
    print(json.dumps({
        "per_step_s": round(per_step, 3),
        "frames_per_step": frames,
        "frames_per_s": round(frames / per_step),
        "train_rtf": round(frames / per_step / sr_frames, 1),
        "loss": round(float(logs["total_loss"]), 4),
        "remat_policy": args.remat_policy,
        "ablate": args.ablate,
        "rng_impl": config.get("dropout_rng_impl", "rbg"),  # base_task default
    }))


if __name__ == "__main__":
    main()

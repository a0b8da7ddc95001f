"""Train-STEP parity vs an independent torch AdamW loop (VERDICT r2 Next #3).

Forward parity and loss formulas are proven elsewhere; this file closes the
last parity class: N optimizer steps of the jitted train step against an
independently written torch training loop on identical batches, asserting
per-step losses and post-step parameters.

Scenarios:
  A. reference-identical — batches with no padding of any kind, where our
     masked machinery provably coincides with the reference's unmasked math
     (BN stats over all frames == over real frames; whole-tensor loss means
     == masked means). Torch side: BCEWithLogitsLoss + cumsum-EMD +
     clip_grad_norm_ + torch.optim.AdamW, per reference training/me_task.py:
     74-111 and configs/base.yaml optimizer_args.
  B. masked semantics — a ragged batch padded past the reference's batch max
     onto the TPU bucket grid. The torch oracle loop runs on the batch padded
     only to its max length (what the reference would see) with the masked-BN
     / masked-conv semantics this framework documents; parity proves bucket
     padding changes neither the loss nor a single gradient.
  C. gradient accumulation — optax.MultiSteps(k=2) against a torch loop that
     accumulates loss/k over k micro-batches before each clipped step.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from some_tpu.compat.to_torch import backbone_to_torch_state_dict
from tests.torch_oracle import OracleModel

LAY, DIM, INDIM, HEADS, HEAD_DIM, KS = 1, 32, 16, 2, 16, 7
NUM_BINS = 32
MIDI_MIN, MIDI_MAX, DEV = 0, 127, 1.0
LR, BETA1, BETA2, WD, CLIP = 1e-3, 0.9, 0.98, 0.01, 1.0


def parity_config():
    return {
        "audio_sample_rate": 44100, "hop_size": 512, "win_size": 2048,
        "fmin": 40, "fmax": 8000, "units_dim": INDIM,
        "midi_num_bins": NUM_BINS, "midi_min": MIDI_MIN, "midi_max": MIDI_MAX,
        "midi_prob_deviation": DEV, "rest_threshold": 0.1, "seed": 7,
        "use_midi_loss": True, "use_bound_loss": True,
        "optimizer_args": {"optimizer_cls": "torch.optim.AdamW", "lr": LR,
                           "beta1": BETA1, "beta2": BETA2, "weight_decay": WD},
        "lr_scheduler_args": {"scheduler_cls": "lr_scheduler.scheduler.WarmupLR",
                              "warmup_steps": 4, "min_lr": 1e-5},
        "clip_grad_norm": CLIP, "accumulate_grad_batches": 1,
        "frame_bucket_grid": 32, "torch_style_init": True,
        "midi_extractor_args": {
            "lay": LAY, "dim": DIM, "use_lay_skip": True, "kernel_size": KS,
            # zero dropout: the only stochastic op, so both loops are
            # deterministic on identical batches
            "conv_drop": 0.0, "ffn_latent_drop": 0.0, "ffn_out_drop": 0.0,
            "attention_drop": 0.0, "attention_heads": HEADS,
            "attention_heads_dim": HEAD_DIM,
        },
    }


def make_items(rng, frame_counts, note_counts, indim=INDIM):
    items = []
    for n_frames, n_notes in zip(frame_counts, note_counts):
        note_dur = rng.multinomial(
            n_frames - n_notes, np.ones(n_notes) / n_notes) + 1
        items.append({
            "units": rng.standard_normal((n_frames, indim)).astype(np.float32),
            "pitch": rng.uniform(40, 80, n_frames).astype(np.float32),
            "note_midi": rng.uniform(40, 80, n_notes).astype(np.float32),
            "note_rest": (rng.random(n_notes) < 0.25),
            "note_dur": note_dur.astype(np.int64),
            "unit2note": np.repeat(
                np.arange(1, n_notes + 1), note_dur).astype(np.int64),
            "length": n_frames,
        })
    return items


def torch_targets(note_midi, note_rest, note_mask, unit2note,
                  num_bins=NUM_BINS):
    """Reference collater target construction (training/me_task.py:26-51),
    re-derived in torch: gaussian-blurred pitch probs gathered to frames,
    plus the boundary train."""
    interval = (MIDI_MAX - MIDI_MIN) / (num_bins - 1)
    sigma = DEV / interval
    miu = ((note_midi - MIDI_MIN) / interval)[:, :, None]
    x = torch.arange(num_bins).float().reshape(1, 1, -1)
    probs = ((x - miu) / sigma).pow(2).div(-2).exp()
    probs = probs * (note_mask[..., None] & ~note_rest[..., None])
    probs = F.pad(probs, [0, 0, 1, 0])
    probs = torch.gather(probs, 1, unit2note[..., None].repeat(1, 1, num_bins))
    bounds = (torch.diff(unit2note, dim=1,
                         prepend=unit2note.new_zeros((len(unit2note), 1)))
              > 0).float()
    return probs, bounds


def build_task_and_torch(config):
    """Init the jax task, convert its params into the torch oracle, and
    return (task, state, oracle, train_step, mesh)."""
    import jax

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask

    task = MIDIExtractionTask(config)
    mesh = make_mesh(jax.devices()[:1])
    train_step = task.make_train_step(mesh, donate=False)
    state = task.init_state()

    args = config["midi_extractor_args"]
    oracle = OracleModel(args["lay"], args["dim"], config["units_dim"],
                         config["midi_num_bins"],
                         kernel_size=args["kernel_size"],
                         heads=args["attention_heads"],
                         dim_head=args["attention_heads_dim"])
    sd = backbone_to_torch_state_dict(
        jax.device_get(state.params), jax.device_get(state.batch_stats))
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing)
    oracle.train()
    return task, state, oracle, train_step, mesh


def torch_adamw(oracle):
    return torch.optim.AdamW(oracle.parameters(), lr=LR, betas=(BETA1, BETA2),
                             eps=1e-8, weight_decay=WD)


def assert_param_parity(params, batch_stats, oracle, rms_tol=1e-4,
                        bulk_atol=1e-4, bulk_frac=0.01, p999_tol=2e-3):
    """Post-step parameter agreement, converted into torch key space.

    Distribution-based rather than elementwise-max: AdamW's first-step
    update is lr*sign(g) for any element, so parameters whose true gradient
    is ~0 (e.g. the depthwise-conv bias, which the following BatchNorm's
    mean subtraction makes exactly degenerate) random-walk on float noise
    at full lr scale in BOTH frameworks, uncorrelated. Measured healthy
    drift after 6 steps: RMS 2.8e-5, 0.4% of elements > 1e-4, p99.9 at
    4.9e-4. Real divergences (wrong betas/lr/clip/weight-decay) blow every
    one of these bounds."""
    import jax

    got = backbone_to_torch_state_dict(jax.device_get(params),
                                       jax.device_get(batch_stats))
    want = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    diffs = []
    for key, ref in want.items():
        if key.endswith("num_batches_tracked"):
            continue
        assert key in got, key
        assert got[key].shape == ref.shape, key
        diffs.append(np.abs(got[key] - ref).ravel())
    d = np.concatenate(diffs)
    rms = float(np.sqrt((d ** 2).mean()))
    frac = float((d > bulk_atol).mean())
    p999 = float(np.quantile(d, 0.999))
    assert rms <= rms_tol, (rms, rms_tol)
    assert frac <= bulk_frac, (frac, bulk_frac)
    assert p999 <= p999_tol, (p999, p999_tol)


def test_train_steps_match_torch_adamw_no_padding():
    """Scenario A: 6 AdamW steps on padding-free batches agree with the
    reference-semantics torch loop in per-step loss and final parameters."""
    from some_tpu.parallel.mesh import shard_batch

    config = parity_config()
    task, state, oracle, train_step, mesh = build_task_and_torch(config)
    opt = torch_adamw(oracle)

    rng = np.random.default_rng(11)
    batches = [task.collate(make_items(rng, [64, 64], [8, 8]))
               for _ in range(6)]
    for b in batches:  # padding-free by construction
        assert b["units"].shape[1] == 64 and b["mask"].all()
        assert b["note_mask"].all() and b["batch_mask"].all()

    jax_losses, torch_losses, jax_gnorms, torch_gnorms = [], [], [], []
    for i, batch in enumerate(batches):
        state, logs = train_step(state, shard_batch(batch, mesh))
        jax_losses.append(float(logs["total_loss"]))
        jax_gnorms.append(float(logs["grad_norm"]))

        units = torch.from_numpy(batch["units"])
        mask = torch.from_numpy(batch["mask"])
        probs_t, bounds_t = torch_targets(
            torch.from_numpy(batch["note_midi"]),
            torch.from_numpy(batch["note_rest"]),
            torch.from_numpy(batch["note_mask"]),
            torch.from_numpy(batch["unit2note"]))
        logits, bound_pred = oracle(units, mask=mask, sig=False)
        midi_loss = torch.nn.BCEWithLogitsLoss()(logits, probs_t)
        scale = float(np.sqrt(bounds_t.shape[1]))
        bound_loss = torch.nn.L1Loss()(bound_pred.cumsum(dim=1) / scale,
                                       bounds_t.cumsum(dim=1) / scale)
        total = midi_loss + bound_loss
        opt.zero_grad()
        total.backward()
        torch_gnorms.append(float(
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), CLIP)))
        for group in opt.param_groups:
            group["lr"] = float(task.schedule(i))
        opt.step()
        torch_losses.append(float(total.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(jax_gnorms, torch_gnorms, rtol=2e-3)
    assert_param_parity(state.params, state.batch_stats, oracle)


# ---- scenario B: masked semantics under bucket padding ----

def masked_conv(conv, x, mask):
    """Our ConvModule's masked semantics in torch: zero padded frames before
    the depthwise conv; BatchNorm statistics over real frames only."""
    x = x.transpose(1, 2)
    x = F.glu(conv.pointwise_conv1(x), dim=1)
    w = mask[:, None, :].float()
    x = x * w
    x = conv.depthwise_conv(x)
    cnt = w.sum().clamp(min=1.0)
    mean = (x * w).sum(dim=(0, 2)) / cnt
    var = (((x - mean[None, :, None]) ** 2) * w).sum(dim=(0, 2)) / cnt
    with torch.no_grad():  # running stats: torch momentum, unbiased var,
        # masked count — the semantics MaskedBatchNorm documents
        mom = conv.norm.momentum
        conv.norm.running_mean.mul_(1 - mom).add_(mom * mean)
        conv.norm.running_var.mul_(1 - mom).add_(
            mom * var * cnt / (cnt - 1.0).clamp(min=1.0))
    xn = (x - mean[None, :, None]) * torch.rsqrt(
        var[None, :, None] + conv.norm.eps)
    x = xn * conv.norm.weight[None, :, None] + conv.norm.bias[None, :, None]
    x = F.silu(x)
    x = conv.pointwise_conv2(x)
    return x.transpose(1, 2)


def masked_block(block, x, mask):
    x = block.ffn1(block.norm1(x)) * 0.5 + x
    x = block.att(block.norm2(x), mask=mask) + x
    x = masked_conv(block.conv, block.norm3(x), mask) + x
    x = block.ffn2(block.norm4(x)) * 0.5 + x
    return block.norm5(x)


def masked_forward(oracle, x, mask):
    """MidiConformer's masked training forward, independently in torch:
    mask attention everywhere, zero the midi stream at padded frames after
    in-proj and each dual layer (conformer.py:474-501)."""
    bb = oracle.model
    midi = bb.inln(x)
    bound = bb.inln1(x)
    midi = midi.masked_fill(~mask.unsqueeze(-1), 0)
    for blk in bb.cf_lay:
        m = masked_block(blk.att1, midi, mask)
        b = masked_block(blk.att2, bound, mask)
        midi_msg = F.glu(blk.glu1(m), dim=2)
        bound_msg = F.glu(blk.glu2(b), dim=2)
        midi, bound = m + bound_msg, b + midi_msg
        midi = midi.masked_fill(~mask.unsqueeze(-1), 0)
    midi = masked_block(bb.att1, midi, mask)
    bound = masked_block(bb.att2, bound, mask)
    bound_prob = torch.sigmoid(bb.cutheard(bound)).squeeze(-1)
    return bb.outln(midi), bound_prob


def test_train_steps_match_masked_torch_oracle_under_bucket_padding():
    """Scenario B: rows of 56 and 48 real frames. Our batch rides the
    64-frame bucket; the torch loop sees the batch padded only to 56 (the
    reference's batch max). Agreement proves the bucket tail contributes
    nothing to the loss or any gradient."""
    from some_tpu.parallel.mesh import shard_batch

    config = parity_config()
    task, state, oracle, train_step, mesh = build_task_and_torch(config)
    opt = torch_adamw(oracle)

    rng = np.random.default_rng(13)
    batches = [task.collate(make_items(rng, [56, 48], [8, 6]))
               for _ in range(4)]
    for b in batches:
        assert b["units"].shape[1] == 64            # bucket grid
        assert int(b["t_real"][0]) == 56            # reference batch max

    jax_losses, torch_losses, jax_gnorms, torch_gnorms = [], [], [], []
    for i, batch in enumerate(batches):
        state, logs = train_step(state, shard_batch(batch, mesh))
        jax_losses.append(float(logs["total_loss"]))
        jax_gnorms.append(float(logs["grad_norm"]))

        t_real = int(batch["t_real"][0])
        units = torch.from_numpy(batch["units"][:, :t_real])
        mask = torch.from_numpy(batch["mask"][:, :t_real])
        probs_t, bounds_t = torch_targets(
            torch.from_numpy(batch["note_midi"]),
            torch.from_numpy(batch["note_rest"]),
            torch.from_numpy(batch["note_mask"]),
            torch.from_numpy(batch["unit2note"][:, :t_real]))
        logits, bound_pred = masked_forward(oracle, units, mask)
        # reference loss semantics on the max-length-padded batch:
        # whole-tensor means (within-batch padding participates)
        midi_loss = torch.nn.BCEWithLogitsLoss()(logits, probs_t)
        scale = float(np.sqrt(t_real))
        bound_loss = torch.nn.L1Loss()(bound_pred.cumsum(dim=1) / scale,
                                       bounds_t.cumsum(dim=1) / scale)
        total = midi_loss + bound_loss
        opt.zero_grad()
        total.backward()
        torch_gnorms.append(float(
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), CLIP)))
        for group in opt.param_groups:
            group["lr"] = float(task.schedule(i))
        opt.step()
        torch_losses.append(float(total.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(jax_gnorms, torch_gnorms, rtol=2e-3)
    assert_param_parity(state.params, state.batch_stats, oracle)


def test_grad_accumulation_matches_torch():
    """Scenario C: optax.MultiSteps(k=2) equals a torch loop accumulating
    loss/k over k micro-batches before each clipped AdamW step."""
    from some_tpu.parallel.mesh import shard_batch

    config = parity_config()
    config["accumulate_grad_batches"] = 2
    task, state, oracle, train_step, mesh = build_task_and_torch(config)
    opt = torch_adamw(oracle)

    rng = np.random.default_rng(17)
    micro = [task.collate(make_items(rng, [64, 64], [8, 8]))
             for _ in range(4)]

    for batch in micro:
        state, logs = train_step(state, shard_batch(batch, mesh))

    opt.zero_grad()
    for i, batch in enumerate(micro):
        units = torch.from_numpy(batch["units"])
        mask = torch.from_numpy(batch["mask"])
        probs_t, bounds_t = torch_targets(
            torch.from_numpy(batch["note_midi"]),
            torch.from_numpy(batch["note_rest"]),
            torch.from_numpy(batch["note_mask"]),
            torch.from_numpy(batch["unit2note"]))
        logits, bound_pred = oracle(units, mask=mask, sig=False)
        midi_loss = torch.nn.BCEWithLogitsLoss()(logits, probs_t)
        scale = float(np.sqrt(bounds_t.shape[1]))
        bound_loss = torch.nn.L1Loss()(bound_pred.cumsum(dim=1) / scale,
                                       bounds_t.cumsum(dim=1) / scale)
        ((midi_loss + bound_loss) / 2).backward()
        if i % 2 == 1:
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), CLIP)
            for group in opt.param_groups:
                group["lr"] = float(task.schedule(i // 2))
            opt.step()
            opt.zero_grad()

    assert int(state.step) == 4  # micro-steps; 2 applied updates
    assert_param_parity(state.params, state.batch_stats, oracle)


def test_prod_geometry_train_step_loss_parity():
    """Production geometry (8x512 — reference configs/midi_conformer.yaml):
    2 AdamW steps at full width and depth, asserting per-step loss and
    clipped grad-norm parity. Elementwise parameter agreement at this depth
    is dominated by f32 reduction-order drift amplified across 8 residual
    layers; the tiny-geometry scenarios above pin the exact update math,
    this pins the trajectory at scale (VERDICT r2 Next #3)."""
    from some_tpu.parallel.mesh import shard_batch

    config = parity_config()
    config["units_dim"] = 80
    config["midi_num_bins"] = 128
    config["midi_extractor_args"].update(
        lay=8, dim=512, kernel_size=31,
        attention_heads=8, attention_heads_dim=64)
    task, state, oracle, train_step, mesh = build_task_and_torch(config)
    opt = torch_adamw(oracle)

    rng = np.random.default_rng(23)
    batches = [task.collate(make_items(rng, [64, 64], [8, 8], indim=80))
               for _ in range(2)]

    jax_losses, torch_losses, jax_gnorms, torch_gnorms = [], [], [], []
    for i, batch in enumerate(batches):
        state, logs = train_step(state, shard_batch(batch, mesh))
        jax_losses.append(float(logs["total_loss"]))
        jax_gnorms.append(float(logs["grad_norm"]))

        units = torch.from_numpy(batch["units"])
        mask = torch.from_numpy(batch["mask"])
        probs_t, bounds_t = torch_targets(
            torch.from_numpy(batch["note_midi"]),
            torch.from_numpy(batch["note_rest"]),
            torch.from_numpy(batch["note_mask"]),
            torch.from_numpy(batch["unit2note"]), num_bins=128)
        logits, bound_pred = oracle(units, mask=mask, sig=False)
        midi_loss = torch.nn.BCEWithLogitsLoss()(logits, probs_t)
        scale = float(np.sqrt(bounds_t.shape[1]))
        bound_loss = torch.nn.L1Loss()(bound_pred.cumsum(dim=1) / scale,
                                       bounds_t.cumsum(dim=1) / scale)
        total = midi_loss + bound_loss
        opt.zero_grad()
        total.backward()
        torch_gnorms.append(float(
            torch.nn.utils.clip_grad_norm_(oracle.parameters(), CLIP)))
        for group in opt.param_groups:
            group["lr"] = float(task.schedule(i))
        opt.step()
        torch_losses.append(float(total.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3)
    np.testing.assert_allclose(jax_gnorms, torch_gnorms, rtol=1e-2)

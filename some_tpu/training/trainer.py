"""Training loop: host orchestration around the jitted mesh train step.

Replaces the reference's Lightning Trainer wiring (reference: train.py:60-98,
training/base_task.py:238-319) with an explicit loop:

  * deterministic epoch-seeded bucketed sampler (host, per process rank)
  * collate -> static-shape bucket pad -> device_put with batch sharded over
    the mesh's data axis (grad psum over ICI comes from GSPMD)
  * jitted donated train step; scalar logs fetched asynchronously
  * validation every val_check_interval steps (rank 0), with metric counters
    computed on device and matplotlib figures on host
  * step-named checkpoints with top-k + permanent retention and auto-resume

Grad accumulation maps to ``required_batch_count_multiple`` exactly as the
reference sampler does; LR-on-resume needs no "replay" (the optax schedule is
a pure function of the step counter — reference needed simulate_lr_scheduler,
utils/__init__.py:272-283, because torch schedulers are stateful).
"""
from __future__ import annotations

import logging
import pathlib
import time
from typing import Optional

import jax
import numpy as np

from some_tpu.data.sampler import BucketBatchSampler, EvalBatchSampler
from some_tpu.parallel.mesh import make_mesh, shard_batch
from some_tpu.training.base_task import BaseTask, TrainState
from some_tpu.training.checkpoint import CheckpointManager, latest_checkpoint, load_any_checkpoint

log = logging.getLogger("some_tpu.trainer")


class Trainer:
    def __init__(self, task: BaseTask, work_dir: pathlib.Path | str,
                 mesh=None, log_writer=None):
        self.task = task
        self.config = task.config
        self.work_dir = pathlib.Path(work_dir)
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.ckpt_manager = CheckpointManager(
            self.work_dir,
            keep_top_k=self.config.get("num_ckpt_keep", 5),
            permanent_start=self.config.get("permanent_ckpt_start", 0),
            permanent_interval=self.config.get("permanent_ckpt_interval", 0),
        )
        self.log_writer = log_writer
        self.max_updates = self.config.get("max_updates", 100000)
        self.log_interval = self.config.get("log_interval", 100)
        self.val_check_interval = self.config.get("val_check_interval", 1000)
        self.num_sanity_val_steps = self.config.get("num_sanity_val_steps", 1)

    # ---- state ----
    def restore_or_init(self) -> TrainState:
        ckpt_path = latest_checkpoint(self.work_dir)
        state = self.task.init_state()
        if ckpt_path is None and self.config.get("finetune_enabled"):
            state = self._load_finetune(state)
            log.info("initialized from finetune checkpoint")
            return state
        if ckpt_path is not None:
            ckpt = load_any_checkpoint(ckpt_path)
            state = self._restore_from_ckpt(state, ckpt)
            log.info("resumed from %s at step %d", ckpt_path, int(state.step))
        return state

    def _restore_from_ckpt(self, state: TrainState, ckpt: dict) -> TrainState:
        from flax import serialization
        params = serialization.from_state_dict(state.params, ckpt["params"])
        batch_stats = serialization.from_state_dict(
            state.batch_stats, ckpt.get("batch_stats") or {})
        opt_state = state.opt_state
        if ckpt.get("opt_state") is not None:
            opt_state = serialization.from_state_dict(state.opt_state, ckpt["opt_state"])
        meta = ckpt.get("meta", {})
        k = getattr(self.task, "grad_accum", 1)
        micro = int(meta.get("micro_step", int(meta.get("step", 0)) * k))
        # Fit-loop position for resume-deterministic data order
        # (reference: Lightning's loops.state_dict restores epoch + batch
        # progress, utils/training_utils.py:206-211, train.py:98).
        self._resume_epoch = int(meta.get("epoch", 0))
        self._resume_epoch_batch = int(meta.get("epoch_batch", 0))
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=np.int32(micro))

    def _load_finetune(self, state: TrainState) -> TrainState:
        """Partial-load a pretrained ckpt with prefix blacklist and
        shape-mismatch filtering (reference: training/base_task.py:165-213)."""
        import jax.tree_util as jtu

        ckpt = load_any_checkpoint(self.config["finetune_ckpt_path"])
        # reference blacklists name Lightning state-dict keys ('model.xxx',
        # base_task.py:200-207); accept those verbatim and also match bare
        blacklist = []
        for prefix in (self.config.get("finetune_ignored_params") or []):
            blacklist.append(prefix)
            if prefix.startswith("model."):
                blacklist.append(prefix[len("model."):])
        blacklist = tuple(blacklist)
        strict_shapes = self.config.get("finetune_strict_shapes", True)

        def merge(cur_tree, new_tree, collection):
            cur_flat = dict(jtu.tree_flatten_with_path(cur_tree)[0])
            new_flat = dict(jtu.tree_flatten_with_path(new_tree)[0])
            merged = {}
            for path, cur_leaf in cur_flat.items():
                name = f"{collection}." + ".".join(
                    getattr(k, "key", str(k)) for k in path)
                new_leaf = new_flat.get(path)
                use_new = (new_leaf is not None
                           and not any(name.startswith(b) or name.split(".", 1)[-1]
                                       .startswith(b) for b in blacklist))
                if use_new and new_leaf.shape != cur_leaf.shape:
                    if strict_shapes:
                        raise ValueError(f"shape mismatch for {name}: "
                                         f"{new_leaf.shape} vs {cur_leaf.shape}")
                    log.warning("| unmatched key (shape): %s %s vs %s",
                                name, new_leaf.shape, cur_leaf.shape)
                    use_new = False
                merged[path] = np.asarray(new_leaf) if use_new else cur_leaf
            treedef = jtu.tree_structure(cur_tree)
            return jtu.tree_unflatten(treedef, [merged[p] for p, _ in
                                                jtu.tree_flatten_with_path(cur_tree)[0]])

        params = merge(state.params, ckpt["params"], "params")
        batch_stats = state.batch_stats
        if ckpt.get("batch_stats"):
            batch_stats = merge(state.batch_stats, ckpt["batch_stats"], "batch_stats")
        return state.replace(params=params, batch_stats=batch_stats)

    # ---- logging ----
    def _log_scalars(self, tag_prefix: str, scalars: dict, step: int):
        if self.log_writer is None:
            return
        for key, value in scalars.items():
            self.log_writer.add_scalar(f"{tag_prefix}/{key}", float(value), step)

    # ---- main loop ----
    def _epoch_batches(self, sampler, epoch: int, train_ds, sizes):
        """Yield (batch_index_list, common_shape_or_None) for this process.

        Multi-process: the sampler is deterministic in (seed, epoch), so
        every process recomputes ALL ranks' assignments and derives each
        step's cross-rank shape maxima locally — shape agreement without any
        communication. Note lengths come from HDF5 shape metadata only.
        """
        sampler.set_epoch(epoch)
        if jax.process_count() == 1:
            for batch in sampler:
                yield batch, None
            return
        all_ranks = sampler.form_all_batches()
        own = all_ranks[jax.process_index()]
        note_key = getattr(self.task, "note_length_key", None)

        def note_len(i):
            return train_ds.attr_length(i, note_key) if note_key else 0

        from some_tpu.parallel.mesh import local_mesh_size
        b_multiple = local_mesh_size(self.mesh)
        for t, batch in enumerate(own):
            step_batches = [r[t] for r in all_ranks]
            common = {
                "t": max(max(int(sizes[i]) for i in b) for b in step_batches),
                "b": max(len(b) for b in step_batches),
                "n": max(max(note_len(i) for i in b) for b in step_batches),
                # local rows must split evenly over this process's devices
                "b_multiple": b_multiple,
            }
            yield batch, common

    def _prepared_batches(self, epoch_iter, train_ds):
        """(idx_list, common) -> (idx_list, sharded device batch), with the
        HDF5 reads + collate + device_put of batch N+1 running in a worker
        thread while the device executes step N (the reference gets this
        overlap from ds_workers persistent DataLoader processes,
        training/base_task.py:360-380; config key kept). ds_workers: 0
        disables the thread; any N>0 sets the lookahead depth."""
        def prepare(args):
            idx_list, common = args
            items = [train_ds[i] for i in idx_list]
            batch = self.task.collate(items, common=common)
            return idx_list, shard_batch(batch, self.mesh)

        depth = int(self.config.get("ds_workers", 1) or 0)
        if depth <= 0:
            for args in epoch_iter:
                yield prepare(args)
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = threading.Event()
        sentinel = object()

        def worker():
            try:
                for args in epoch_iter:
                    if stop.is_set():
                        return
                    q.put(prepare(args))
                q.put(sentinel)
            except BaseException as exc:  # surfaced on the main thread
                q.put(exc)

        thread = threading.Thread(target=worker, daemon=True,
                                  name="some_tpu-prefetch")
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # unblock a worker parked on put()
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def fit(self, max_steps: Optional[int] = None):
        config = self.config
        (train_ds, train_sizes), (valid_ds, valid_sizes) = self.task.load_datasets()
        sampler = BucketBatchSampler(
            sizes=train_sizes,
            max_batch_frames=config["max_batch_frames"],
            max_batch_size=config["max_batch_size"],
            num_replicas=jax.process_count(), rank=jax.process_index(),
            frame_count_grid=config.get("sampler_frame_count_grid", 6),
            required_batch_count_multiple=config.get("accumulate_grad_batches", 1),
            sort_by_similar_size=config.get("sort_by_len", True),
            shuffle=True, seed=config["seed"])
        # Multi-process validation is data-replicated: every process builds
        # the same batch list from the shared-FS dataset and feeds its
        # device shard, so the jitted collective step never deadlocks (the
        # reference instead feeds non-zero ranks dummy batches,
        # utils/training_utils.py:158-171 — same liveness, wasted compute).
        val_sampler = EvalBatchSampler(
            sizes=valid_sizes,
            max_batch_frames=config.get("max_val_batch_frames", 10000),
            max_batch_size=config.get("max_val_batch_size", 1))

        train_step = self.task.make_train_step(self.mesh)
        self.task.make_valid_step(self.mesh)
        state = self.task.place_state(self.restore_or_init())
        # state.step counts micro-batches; reference 'global_step' counts
        # optimizer updates — with grad accumulation they differ by k
        k = getattr(self.task, "grad_accum", 1)
        target = min(self.max_updates, max_steps or self.max_updates) * k

        if self.num_sanity_val_steps and int(state.step) == 0:
            self._validate(state, valid_ds, val_sampler,
                           limit=self.num_sanity_val_steps, sanity=True)

        try:
            from tqdm import tqdm
            progress = tqdm(initial=int(state.step), total=target,
                            desc="train", unit="microstep", dynamic_ncols=True)
        except ImportError:
            progress = None

        profile_dir = self.config.get("profile_dir")
        # Resume mid-epoch at the exact sampler position: the sampler is a
        # pure function of (seed, epoch), so skipping the first `skip`
        # batches replays the uninterrupted data order deterministically.
        epoch = getattr(self, "_resume_epoch", 0)
        skip = getattr(self, "_resume_epoch_batch", 0)
        epoch_batch = skip
        micro_step = int(state.step)
        # interrupt-exact sampler-position accounting: an interrupt can land
        # anywhere inside the loop body, so the except handler derives
        # epoch_batch from state.step (the authoritative applied-step count)
        # instead of trusting a host counter that may be one batch ahead of
        # or behind the in-flight train_step. The per-epoch bookkeeping
        # (epoch, start_micro, start_skip, profile_extra_steps) lives in ONE
        # tuple updated by single stores: a signal-raised KeyboardInterrupt
        # lands between bytecodes, so multi-variable resets could pair a new
        # epoch with the previous epoch's counters (ADVICE r2) — one STORE
        # cannot be observed half-done.
        anchor = (epoch, micro_step, skip, 0)
        t_last = time.time()
        # TPU pod preemptions deliver SIGTERM (the reference only survives
        # Ctrl-C, train.py:98 via Lightning); route it through the same
        # checkpoint-then-exit path as KeyboardInterrupt. Restored on exit so
        # nested/later code sees the default disposition.
        import signal

        def _sigterm(signum, frame):
            raise KeyboardInterrupt("SIGTERM")

        handler_installed = False
        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _sigterm)
            handler_installed = True
        except ValueError:  # not the main thread (e.g. webui background fit)
            pass
        try:
            while micro_step < target:
                epoch = anchor[0]
                epoch_batch = 0
                epoch_iter = self._epoch_batches(
                    sampler, epoch, train_ds, train_sizes)
                # consume the resume-skip BEFORE the prefetcher so skipped
                # batches cost no dataset reads
                while skip > 0:
                    if next(epoch_iter, None) is None:
                        break
                    skip -= 1
                    epoch_batch += 1

                hit_target = False

                def stop_at_target(it):
                    # re-check the LIVE counter before each dataset read so
                    # the synchronous path reads nothing past the target
                    # (with ds_workers>0 the worker thread intentionally
                    # reads ahead; the extra prepared batches are unused)
                    nonlocal hit_target
                    for args in it:
                        if micro_step >= target:
                            hit_target = True
                            return
                        yield args

                for batch_idx_list, batch in self._prepared_batches(
                        stop_at_target(epoch_iter), train_ds):
                    if micro_step >= target:
                        break
                    state, logs = train_step(state, batch)
                    micro_step += 1  # host counter: no device sync per step
                    epoch_batch += 1
                    step = micro_step // k
                    if progress is not None:
                        progress.update(1)
                    if profile_dir and step == self.log_interval:
                        # one traced step early in the run, post-compilation.
                        # Count the extra step BEFORE dispatching it: an
                        # interrupt inside the window then at worst replays
                        # the doubled batch (its re-application lands after
                        # resume instead of during tracing — benign), never
                        # skips a batch that was never trained.
                        anchor = anchor[:3] + (anchor[3] + 1,)
                        from some_tpu.utils.profiling import trace
                        with trace(profile_dir):
                            state, logs = train_step(state, batch)
                            jax.block_until_ready(logs)
                        micro_step += 1
                        step = micro_step // k
                    if micro_step % (self.log_interval * k) == 0:
                        scalars = {k: float(v) for k, v in logs.items()}
                        scalars["lr"] = float(self.task.schedule(step - 1))
                        scalars["batch_size"] = len(batch_idx_list)
                        dt = time.time() - t_last
                        t_last = time.time()
                        scalars["steps_per_sec"] = (
                            self.log_interval / dt if step > self.log_interval else 0.0)
                        self._log_scalars("training", scalars, step)
                        if progress is not None:
                            progress.set_postfix(
                                {k: f"{v:.4g}" for k, v in scalars.items()
                                 if k in ("total_loss", "lr", "steps_per_sec")})
                        else:
                            log.info("step %d | %s", step, " ".join(
                                f"{k}={v:.5g}" for k, v in scalars.items()))
                    if micro_step % (self.val_check_interval * k) == 0:
                        self._validate(state, valid_ds, val_sampler)
                        self._save_ckpt(step, state, epoch, epoch_batch)
                else:
                    # the for can end two ways without break: the epoch is
                    # genuinely exhausted (advance it) or the target guard
                    # stopped the iterator mid-epoch (keep the exact
                    # (epoch, epoch_batch) position for the checkpoint meta)
                    if not hit_target:
                        epoch_batch = 0
                        # epoch advance + counter reset in one store (see
                        # `anchor` comment above): an interrupt here can
                        # observe either epoch's anchor, both consistent
                        anchor = (epoch + 1, micro_step, skip, 0)
                    continue
                break
        except KeyboardInterrupt:
            # preemption/interrupt safety: persist the exact current step.
            # Recompute the sampler position from state.step so a batch whose
            # gradient never applied is not skipped on resume (and one that
            # did apply is not replayed): batches consumed this epoch =
            # batches skipped on entry + micro-steps actually applied.
            a_epoch, a_micro, a_skip, a_extra = anchor  # consistent snapshot
            applied = int(state.step)  # materializes the dispatched chain
            step = applied // k
            epoch_batch = (a_skip - skip) + (applied - a_micro) - a_extra
            log.warning("interrupted at step %d; saving checkpoint", step)
            self._save_ckpt(step, state, a_epoch, epoch_batch)
            raise
        finally:
            if handler_installed:
                # restore even when the prior disposition reads as None
                # (set outside Python) — SIG_DFL is the faithful stand-in
                signal.signal(signal.SIGTERM,
                              prev_handler if prev_handler is not None
                              else signal.SIG_DFL)
            if progress is not None:
                progress.close()

        final_step = int(state.step) // k
        if latest_checkpoint(self.work_dir) is None or \
                final_step > self.ckpt_manager_last_saved_step():
            self._save_ckpt(final_step, state, anchor[0], epoch_batch)
        return state

    def _save_ckpt(self, step: int, state: TrainState, epoch: int,
                   epoch_batch: int) -> None:
        """Write a checkpoint (process 0 only on a shared filesystem; state
        is replicated so process 0 holds every value)."""
        if jax.process_index() != 0:
            return
        self.ckpt_manager.save(step, state.params, state.batch_stats,
                               state.opt_state,
                               extra_meta={"micro_step": int(state.step),
                                           "epoch": epoch,
                                           "epoch_batch": epoch_batch})

    def ckpt_manager_last_saved_step(self) -> int:
        from some_tpu.training.checkpoint import list_checkpoints
        ckpts = list_checkpoints(self.work_dir)
        return ckpts[-1][0] if ckpts else -1

    # ---- validation ----
    def _validate(self, state: TrainState, valid_ds, val_sampler,
                  limit: Optional[int] = None, sanity: bool = False):
        """Runs on EVERY process: the jitted step is a collective program
        over the global mesh, so all processes must step every batch. The
        batch is data-replicated construction (identical on all processes,
        each feeds its row shard); only logging/plots are process-0 work."""
        valid_step = self.task._valid_step
        if valid_step is None:
            valid_step = self.task.make_valid_step(self.mesh)
        n_proc = jax.process_count()
        is_rank0 = jax.process_index() == 0
        loss_sums: dict = {}
        weight_sum = 0
        acc_correct = 0
        acc_total = 0
        num_plots = self.config.get("num_valid_plots", 0)
        for batch_idx, idx_list in enumerate(val_sampler):
            if limit is not None and batch_idx >= limit:
                break
            items = [valid_ds[i] for i in idx_list]
            if n_proc == 1:
                batch = self.task.collate(items)
                local = batch
            else:
                # pad rows so the GLOBAL batch splits evenly over processes
                # (b_multiple handles non-power-of-two process counts), then
                # feed this process's row slice
                batch = self.task.collate(
                    items, common={"b": self.mesh.devices.size,
                                   "b_multiple": self.mesh.devices.size})
                b_pad = batch["batch_mask"].shape[0]
                assert b_pad % n_proc == 0, (b_pad, n_proc)
                b_loc = b_pad // n_proc
                lo = jax.process_index() * b_loc
                local = {k: (v if (np.ndim(v) == 0 or k == "t_real")
                             else v[lo:lo + b_loc])
                         for k, v in batch.items()}
            device_batch = shard_batch(local, self.mesh)
            losses, extras = valid_step(state, device_batch)
            for key, value in losses.items():
                loss_sums[key] = loss_sums.get(key, 0.0) + float(value) * len(idx_list)
            weight_sum += len(idx_list)
            if "midi_acc_correct" in extras:
                acc_correct += int(extras["midi_acc_correct"])
                acc_total += int(extras["midi_acc_total"])
            if not sanity and batch_idx < num_plots:
                try:
                    self.task.validation_plots(
                        self, batch_idx, batch, extras, int(state.step))
                except (AttributeError, NotImplementedError):
                    pass
                except Exception as exc:  # plotting must never kill training
                    log.warning("validation plot failed: %s", exc)
        if weight_sum:
            means = {k: v / weight_sum for k, v in loss_sums.items()}
            self._log_scalars("validation", means, int(state.step))
            if acc_total:
                self._log_scalars("metrics", {"midi_acc": acc_correct / acc_total},
                                  int(state.step))
                means["midi_acc"] = acc_correct / acc_total
            if is_rank0:
                log.info("validation @ %d | %s", int(state.step),
                         " ".join(f"{k}={v:.5g}" for k, v in means.items()))

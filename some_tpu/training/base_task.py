"""Task abstraction: model + losses + jitted train/valid steps over a mesh.

Functional replacement for the reference's LightningModule tasks
(reference: training/base_task.py:79-456). A task owns:
  * the flax model (built from config via the registry),
  * the optax optimizer/schedule chain (grad-clip folded in),
  * pure ``loss_fn`` the jitted train step differentiates,
  * dataset handles + samplers (host plane).

State is an explicit pytree (params / batch_stats / opt_state / step) so the
whole update is one XLA program: donate the state, shard the batch over the
mesh's data axis, and GSPMD inserts the gradient psum over ICI — the DDP
all-reduce with no backend code (SURVEY.md §5.8).
"""
from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from some_tpu.data.indexed_dataset import IndexedDataset, load_lengths
from some_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated_sharding,
)
from some_tpu.training.optimizers import build_optimizer
from some_tpu.training.schedules import build_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


class BaseTask:
    def __init__(self, config: dict):
        self.config = config
        self.timestep = config["hop_size"] / config["audio_sample_rate"]
        precision = str(config.get("pl_trainer_precision", "32-true"))
        self.compute_dtype = jnp.bfloat16 if "bf16" in precision else jnp.float32
        self.model = self.build_model()
        self.schedule = build_schedule(
            config["lr_scheduler_args"], config["optimizer_args"]["lr"])
        self.tx = build_optimizer(
            config["optimizer_args"], self.schedule,
            clip_grad_norm=config.get("clip_grad_norm"))
        if config.get("freezing_enabled") and config.get("frozen_params"):
            self.tx = self._with_frozen_params(self.tx, config["frozen_params"])
        # Gradient accumulation: one optimizer step per k micro-batches
        # (reference: accumulate_grad_batches through the Lightning trainer,
        # train.py:96; the sampler's batch-count multiple guarantees whole
        # accumulation groups per epoch). The inner optimizer's schedule sees
        # applied-update counts, so LR semantics match the reference.
        self.grad_accum = int(config.get("accumulate_grad_batches", 1) or 1)
        if self.grad_accum > 1:
            import optax as _optax
            self.tx = _optax.MultiSteps(self.tx, every_k_schedule=self.grad_accum)
        self.mesh = None
        self.dp_size = 1
        self._train_step = None
        self._valid_step = None

    # ---- to be provided by subclasses ----
    def build_model(self):
        raise NotImplementedError

    def compute_losses(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def model_inputs(self, batch) -> dict:
        return dict(x=batch["units"], f0=batch.get("pitch"), mask=batch.get("mask"))

    def valid_outputs(self, outputs, batch) -> dict:
        """Extra device-side validation products (decodes, metric counters)."""
        return {}

    @staticmethod
    def _with_frozen_params(tx, frozen_prefixes):
        """Zero updates for params whose dotted path starts with a frozen
        prefix (reference: training/base_task.py:144-163; 'model.' prefixes
        from reference configs are accepted and also matched bare)."""
        import jax.tree_util as jtu
        import optax

        prefixes = []
        for prefix in frozen_prefixes:
            prefixes.append(prefix)
            if prefix.startswith("model."):
                prefixes.append(prefix[len("model."):])

        def label(params):
            def leaf_label(path):
                name = ".".join(getattr(k, "key", str(k)) for k in path)
                return "frozen" if any(name.startswith(p) for p in prefixes) \
                    else "trainable"
            return jtu.tree_map_with_path(lambda p, _: leaf_label(p), params)

        return optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label)

    # ---- state management ----
    def init_state(self, seed: int | None = None, example_batch: dict | None = None
                   ) -> TrainState:
        seed = self.config["seed"] if seed is None else seed
        rng = jax.random.PRNGKey(seed)
        if example_batch is None:
            T = 64
            example_batch = {
                "units": np.zeros((1, T, self.config["units_dim"]), np.float32),
                "pitch": np.zeros((1, T), np.float32),
                "mask": np.ones((1, T), bool),
            }
        variables = self.model.init(
            {"params": rng}, example_batch["units"], f0=example_batch.get("pitch"),
            mask=example_batch.get("mask"))
        params = variables["params"]
        if self.config.get("torch_style_init", True):
            # start from the same weight distributions as the torch
            # reference (see some_tpu/nn/init.py)
            from some_tpu.nn.init import torch_style_init
            params = torch_style_init(params, seed=seed)
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(params=params, batch_stats=batch_stats,
                          opt_state=opt_state, step=jnp.asarray(0, jnp.int32))

    def place_state(self, state: TrainState) -> TrainState:
        """Commit the state to the mesh with the replicated sharding the
        train step emits — otherwise the first step call compiles a second
        executable for the uncommitted-input layout. Multi-process: every
        process holds the same host values (seeded init / shared-FS ckpt)
        and they assemble into one replicated global array per leaf."""
        if self.mesh is None:
            return state
        from some_tpu.parallel.distributed import replicate_to_mesh
        return replicate_to_mesh(state, self.mesh)

    def load_variables(self, variables: dict, state: Optional[TrainState] = None
                       ) -> TrainState:
        """Overwrite params/batch_stats (e.g. from a converted torch ckpt)."""
        if state is None:
            state = self.init_state()
        return state.replace(params=variables["params"],
                             batch_stats=variables.get("batch_stats", state.batch_stats))

    # ---- jitted steps ----
    def _loss_and_updates(self, params, batch_stats, batch, rng):
        inputs = self.model_inputs(batch)
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        outputs, new_state = self.model.apply(
            variables, **inputs, deterministic=False, use_running_average=False,
            mutable=mutable, rngs={"dropout": rng})
        losses = self.compute_losses(outputs, batch)
        total = sum(losses.values())
        new_bs = new_state.get("batch_stats", batch_stats) if mutable else batch_stats
        return total, (losses, new_bs)

    def make_train_step(self, mesh=None, donate: bool = True):
        if mesh is None:
            mesh = make_mesh()
        self.mesh = mesh
        # collate pads batch rows to >= the PER-PROCESS device count; the
        # global batch is B_local * process_count (each process feeds its
        # addressable shard)
        from some_tpu.parallel.mesh import local_mesh_size
        self.dp_size = local_mesh_size(mesh)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        # Dropout-mask RNG impl. threefry2x32 (JAX default) generates bits
        # in VPU ALU ops — measured at 35% of the whole 8x512 train step
        # (0.6 s of 1.728 s at 65k frames, tools/bench_train.py --ablate
        # no_dropout; remat recomputes every mask in the backward, doubling
        # it). Default 'rbg' lowers to the TPU hardware generator (XLA
        # RngBitGenerator): measured 1.344 s/step (+29% training RTF), same
        # per-seed determinism on a given backend, weaker cross-version
        # bit-stability guarantees — irrelevant for dropout masks (the
        # torch reference's mask stream differs anyway). Set
        # dropout_rng_impl: threefry2x32 for version-stable mask bits.
        # Param-init and data-order RNG stay threefry.
        impl = str(self.config.get("dropout_rng_impl", "rbg"))
        base_rng = jax.random.key(self.config["seed"], impl=impl)

        def step_fn(state: TrainState, batch: dict):
            rng = jax.random.fold_in(base_rng, state.step)
            grad_fn = jax.value_and_grad(self._loss_and_updates, has_aux=True)
            (total, (losses, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=new_params, batch_stats=new_bs,
                                   opt_state=new_opt, step=state.step + 1)
            logs = {**losses, "total_loss": total,
                    "grad_norm": optax.global_norm(grads)}
            return new_state, logs

        del data  # batch arrays carry their sharding from shard_batch()
        self._train_step = jax.jit(
            step_fn,
            in_shardings=(repl, None),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
        return self._train_step

    def make_valid_step(self, mesh=None):
        if mesh is None:
            mesh = self.mesh or make_mesh()
        repl = replicated_sharding(mesh)

        def step_fn(params, batch_stats, batch: dict):
            inputs = self.model_inputs(batch)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            outputs = self.model.apply(variables, **inputs)
            losses = self.compute_losses(outputs, batch)
            losses["total_loss"] = sum(losses.values())
            extras = self.valid_outputs(outputs, batch)
            return losses, extras

        # Two argument disciplines for the same program:
        #
        # * The jit arguments are ONLY what the forward reads — passing the
        #   whole TrainState shipped the optimizer state (2x Adam moments
        #   ~= 0.8 GB at 8x512) as dead argument weight a remote-dispatch
        #   client serializes before the compiler can DCE it.
        # * HOST-resident arrays passed as jit args re-upload on EVERY call
        #   (measured 9.74 s/call for 0.4 GB of 8x512 params at B=1 x T=128
        #   through the dev tunnel); device-resident arrays — committed or
        #   not — pass by reference at ~0.03 s (both measured,
        #   tools/bench_train.py --ablate valid_fwd[_plain]). The
        #   single-process wrapper device_puts once per state identity (a
        #   no-op for already-placed trainer state; one upload per
        #   validation sweep for host-state callers like checkpoint
        #   evaluation loops). Multi-process keeps the explicitly-sharded
        #   jit (replicated outputs so every process reads losses/extras;
        #   process 0 logs and plots).
        if jax.process_count() > 1:
            jitted = jax.jit(step_fn, in_shardings=(repl, repl, None),
                             out_shardings=(repl, repl))

            def valid_step(state: TrainState, batch: dict):
                return jitted(state.params, state.batch_stats, batch)
        else:
            plain = jax.jit(step_fn)
            # keyed by the params OBJECT (held, not just its id — CPython
            # reuses ids after GC, which would silently serve stale weights
            # when validating a sequence of loaded checkpoints)
            cache = {"key": None, "placed": None}

            def valid_step(state: TrainState, batch: dict):
                if cache["key"] is not state.params:
                    cache["key"] = state.params
                    cache["placed"] = jax.device_put(
                        (state.params, state.batch_stats))
                params, batch_stats = cache["placed"]
                return plain(params, batch_stats, batch)

        self._valid_step = valid_step
        return self._valid_step

    # ---- datasets (host plane) ----
    def load_datasets(self):
        data_dir = pathlib.Path(self.config["binary_data_dir"])
        train_prefix = self.config.get("train_set_name", "train")
        valid_prefix = self.config.get("valid_set_name", "valid")
        train = IndexedDataset(data_dir, train_prefix)
        valid = IndexedDataset(data_dir, valid_prefix)
        train_sizes = load_lengths(data_dir, train_prefix)
        valid_sizes = load_lengths(data_dir, valid_prefix)
        return (train, train_sizes), (valid, valid_sizes)

    def collate(self, items: list, common: dict | None = None) -> dict:
        """items -> padded batch dict. ``common`` carries cross-rank raw
        shape maxima in multi-host mode (see pad_to_bucket)."""
        raise NotImplementedError

    # leading-axis key used for cross-rank note-shape agreement (tasks with
    # note arrays override collate to pad them to a common length)
    note_length_key = "note_midi"

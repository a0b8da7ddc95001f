"""One process of a multi-host training rehearsal (driven by
tests/test_multihost.py, or by hand for N-process CPU rehearsals).

Joins the jax.distributed runtime via the SOME_TPU_COORDINATOR env contract,
forms the global mesh, runs Trainer.fit on a shared-FS dataset, and dumps a
JSON report (device counts, per-rank item stream, parameter fingerprint,
checkpoints written) for the parent to assert on.

This is the TPU-native counterpart of launching the reference with
`devices`/`num_nodes` under Lightning DDP (reference: train.py:62-64).
"""
import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--work_dir", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--steps", type=int, default=4)
    args = parser.parse_args()

    import some_tpu  # noqa: F401  (applies SOME_TPU_PLATFORM before backend init)
    from some_tpu.parallel.distributed import maybe_initialize

    initialized = maybe_initialize()

    import jax
    import numpy as np

    from some_tpu.parallel.mesh import make_mesh
    from some_tpu.training.me_task import MIDIExtractionTask
    from some_tpu.training.trainer import Trainer

    with open(args.config) as f:
        config = json.load(f)
    config["binary_data_dir"] = args.data_dir

    items_seen = []

    class RecordingTask(MIDIExtractionTask):
        def load_datasets(self):
            (tds, tsz), valid = super().load_datasets()

            class _Wrap:
                def __getitem__(self, i):
                    items_seen.append(int(i))
                    return tds[i]

                def attr_length(self, i, key):
                    return tds.attr_length(i, key)

            return (_Wrap(), tsz), valid

    task = RecordingTask(config)
    mesh = make_mesh()
    trainer = Trainer(task, args.work_dir, mesh=mesh)
    state = trainer.fit(max_steps=args.steps)

    fingerprint = float(sum(
        np.abs(np.asarray(leaf, dtype=np.float64)).sum()
        for leaf in jax.tree_util.tree_leaves(state.params)))
    report = {
        "initialized": initialized,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
        "final_step": int(state.step),
        "items_seen": items_seen,
        "param_fingerprint": fingerprint,
        "ckpts": sorted(p.name for p in
                        pathlib.Path(args.work_dir).glob("*.ckpt")),
    }
    with open(args.out, "w") as f:
        json.dump(report, f)


if __name__ == "__main__":
    main()

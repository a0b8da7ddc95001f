"""2-process multi-host training rehearsal over a CPU coordinator.

Proves the full multi-host path the reference gets from Lightning DDP
(reference: train.py:62-64): the global mesh forms across processes, each
rank feeds its disjoint sampler partition, gradients psum over the global
data axis (parameters stay bit-identical on both processes), validation is
collective (no rank-0 deadlock), and checkpoints are written once.
"""
import json
import pathlib
import socket
import subprocess
import sys
import os

import numpy as np
import pytest

from some_tpu.data.indexed_dataset import IndexedDatasetWriter, save_lengths
from tests.test_training import TINY_CONFIG, make_item

REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    rng = np.random.default_rng(2024)
    data_dir = tmp_path / "binary"
    data_dir.mkdir()
    for prefix, n_items in [("train", 8), ("valid", 2)]:
        lengths = []
        with IndexedDatasetWriter(data_dir, prefix) as writer:
            for _ in range(n_items):
                item = make_item(rng, int(rng.integers(40, 120)),
                                 int(rng.integers(3, 8)))
                writer.add_item(item)
                lengths.append(item["length"])
        save_lengths(data_dir, prefix, lengths)

    config = dict(TINY_CONFIG)
    config.update(val_check_interval=2, num_sanity_val_steps=1)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))

    port = _free_port()
    work_dirs = [tmp_path / f"work{r}" for r in range(2)]
    outs = [tmp_path / f"report{r}.json" for r in range(2)]
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.update({
            "SOME_TPU_PLATFORM": "cpu",
            "SOME_TPU_COORDINATOR": f"localhost:{port}",
            "SOME_TPU_NUM_PROCESSES": "2",
            "SOME_TPU_PROCESS_ID": str(rank),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COMPILATION_CACHE_DIR": "/tmp/some_tpu_jax_cache",
            "JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES": "0",
            "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
            "OMP_NUM_THREADS": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_worker.py"),
             "--config", str(cfg_path), "--data_dir", str(data_dir),
             "--work_dir", str(work_dirs[rank]), "--out", str(outs[rank]),
             "--steps", "4"],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.terminate()
            pytest.fail("multi-host worker timed out (possible deadlock)")
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        "\n\n".join(f"--- rank {i} ---\n{log[-4000:]}"
                    for i, log in enumerate(logs))

    reports = [json.loads(o.read_text()) for o in outs]
    for r, report in enumerate(reports):
        assert report["initialized"] is True
        assert report["process_count"] == 2
        assert report["process_index"] == r
        assert report["local_devices"] == 2
        assert report["global_devices"] == 4
        assert report["final_step"] == 4
        assert np.isfinite(report["param_fingerprint"])

    # gradient psum: replicated params must be bit-identical across processes
    assert reports[0]["param_fingerprint"] == reports[1]["param_fingerprint"]

    # the sampler partition fed each rank exactly its own disjoint batch list
    from some_tpu.data.sampler import BucketBatchSampler
    sizes = np.load(data_dir / "train.lengths")
    expected = []
    for rank in range(2):
        sampler = BucketBatchSampler(
            sizes=sizes, max_batch_frames=config["max_batch_frames"],
            max_batch_size=config["max_batch_size"],
            num_replicas=2, rank=rank,
            frame_count_grid=config["sampler_frame_count_grid"],
            required_batch_count_multiple=config["accumulate_grad_batches"],
            sort_by_similar_size=config["sort_by_len"],
            shuffle=True, seed=config["seed"])
        stream = []
        epoch = 0
        while len(stream) < 4:
            sampler.set_epoch(epoch)
            for b in sampler.form_batches():
                stream.append(list(b))
                if len(stream) >= 4:
                    break
            epoch += 1
        expected.append([i for b in stream for i in b])
    assert reports[0]["items_seen"] == expected[0]
    assert reports[1]["items_seen"] == expected[1]

    # checkpoints written by process 0 only
    assert reports[0]["ckpts"], "rank 0 wrote no checkpoint"
    assert not reports[1]["ckpts"], "rank 1 must not write checkpoints"

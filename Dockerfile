# SOME-TPU serving image (reference counterpart: Dockerfile:1-13, which
# packaged the torch webui on a CUDA base; this targets Cloud TPU VMs).
#
# Build:  docker build -t some-tpu .
# Run:    docker run --privileged --net host some-tpu   # TPU VM runtime
FROM python:3.12-slim

# g++ so the ctypes-loaded host-plane C++ (some_tpu/native/) rebuilds on
# first use for THIS image's CPU — the .so cache is keyed by host ISA
# flags, so a prebuilt library from the build machine would be ignored.
# Without a compiler every native entry point falls back to pure numpy
# (slower decimation/slicing, same results).
RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax h5py scipy pyyaml click matplotlib tensorboardX tqdm
# torch (CPU wheels) only for reading published PyTorch checkpoints
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /app
# Bound glibc's per-thread malloc arenas: the serving stack moves multi-MB
# WAV bodies across pooled handler threads, and unbounded arenas fragment
# RSS under concurrency (measured in tools/bench_serve.py's soak).
ENV MALLOC_ARENA_MAX=2
COPY some_tpu ./some_tpu
COPY configs ./configs
COPY tools ./tools
COPY infer.py batch_infer.py binarize.py train.py export.py webui.py \
     simplify.py serve.py stream.py bench.py __graft_entry__.py ./

# place checkpoints under /app/experiments (e.g. the published
# 0918_continuous256_clean_3spk_fixmel release, converted or as-is)
EXPOSE 7860 8572
# interactive webui by default; for the production batch-serving API run
#   docker run ... some-tpu python serve.py --model experiments/model.ckpt \
#     --prewarm 768,1024 --recycle-after 50000
# (--prewarm compiles the expected buckets before traffic; --recycle-after
#  bounds worker lifetime — the PJRT tunnel client measured ~1 MB/request
#  of host retention, BENCH_NOTES "Serve-soak RSS slope")
# and for live pipe transcription
#   ... some-tpu python stream.py --model experiments/model.ckpt
CMD ["python", "webui.py", "--work_dir", "experiments", "--addr", "0.0.0.0"]

# SOME-TPU serving image (reference counterpart: Dockerfile:1-13, which
# packaged the torch webui on a CUDA base; this targets Cloud TPU VMs).
#
# Build:  docker build -t some-tpu .
# Run:    docker run --privileged --net host some-tpu   # TPU VM runtime
FROM python:3.12-slim

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax h5py scipy pyyaml click matplotlib tensorboardX tqdm

# torch (CPU wheels) only for reading published PyTorch checkpoints
RUN pip install --no-cache-dir torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /app
COPY some_tpu ./some_tpu
COPY configs ./configs
COPY infer.py batch_infer.py binarize.py train.py export.py webui.py simplify.py ./

# place checkpoints under /app/experiments (e.g. the published
# 0918_continuous256_clean_3spk_fixmel release, converted or as-is)
EXPOSE 7860
CMD ["python", "webui.py", "--work_dir", "experiments", "--addr", "0.0.0.0"]

# gato_tpu container image — TPU analogue of the reference's CUDA image
# (/root/reference/Dockerfile: CUDA 12.2 + ROS base + pinocchio/crocoddyl).
# A TPU VM already provides the accelerator driver via libtpu, so the image
# only needs python + jax[tpu] + the native toolchain for librbd.so.
FROM python:3.12-slim

ENV DEBIAN_FRONTEND=noninteractive
RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ git ca-certificates \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY . /workspace

# On a TPU VM use the libtpu wheel; on CPU-only hosts this still installs
# and runs everything (tests force the CPU backend).
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || pip install --no-cache-dir jax
RUN pip install --no-cache-dir numpy pytest && pip install -e .

# build the native rigid-body runtime (cross-validation oracle + host sim)
RUN bash tools/build.sh

CMD ["/bin/bash"]

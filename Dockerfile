# Reproducible environment for forest_slam_tpu — the rebuild's equivalent
# of the reference's fully-pinned container (Forest-SLAM Dockerfile:1-92,
# which pins CUDA 12.3.2 + ROS Noetic + OpenCV-from-source). The TPU
# rebuild needs none of that stack: the whole pipeline is JAX + a small
# C++ ctypes extension, so the container is a slim Debian + the exact
# Python set in constraints.txt.
#
# Build:  docker build -t forest-slam-tpu .
# Test:   docker run --rm forest-slam-tpu python -m pytest tests/ -q
#         (tests force the CPU platform + a virtual 8-device mesh; no TPU
#          needed — see tests/conftest.py)
# TPU:    on a TPU VM, run with the host network and /dev/accel* visible;
#         libtpu is pinned in constraints.txt and picked up by jax.
FROM python:3.12.12-slim-bookworm

# g++ builds the native bag reader (forest_slam_tpu/native/, ctypes C ABI
# — built on first use); bzip2 headers are NOT needed (the bag parser
# uses Python's bz2 for compressed chunks).
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/forest_slam_tpu
COPY constraints.txt pyproject.toml ./
# jax[tpu] resolves jaxlib + libtpu at the pinned versions on TPU hosts;
# plain jax (CPU) is enough everywhere else.
RUN pip install --no-cache-dir -c constraints.txt \
    jax flax optax chex orbax-checkpoint numpy scipy einops pytest

COPY forest_slam_tpu ./forest_slam_tpu
COPY tests ./tests
COPY weights ./weights
COPY scripts ./scripts
COPY bench.py Makefile README.md ./
RUN pip install --no-cache-dir --no-deps -e .

CMD ["python", "-m", "pytest", "tests/", "-q"]

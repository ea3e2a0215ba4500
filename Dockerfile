# TPU image for encodec_pytorch_tpu (analogue of the reference's CUDA
# Dockerfile). Base: a JAX TPU image with jax/flax/optax preinstalled.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml ./
COPY encodec_pytorch_tpu ./encodec_pytorch_tpu
COPY scripts ./scripts

# On TPU VMs install the libtpu-bundled jax instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir jax flax optax einops numpy scipy pyyaml pandas tensorboardX

# prebuild the native bitstream library
RUN g++ -O3 -fPIC -shared encodec_pytorch_tpu/native/ecdc.cpp \
    -o encodec_pytorch_tpu/native/libecdc.so

ENTRYPOINT ["python", "-m", "encodec_pytorch_tpu.train_cli"]

# Container spec for ionic_mpnn_tpu (the reference ships a conda+pip
# Dockerfile, Dockerfile:1-30; this is the TPU-native equivalent).
#
# TPU runtime note: on Cloud TPU VMs the host supplies libtpu; the jax
# install below brings the matching release. For CPU-only development
# substitute `pip install jax` for the [tpu] extra.

FROM python:3.12-slim

# native toolchain for the C++ packer (built on first import via g++)
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/ionic_mpnn_tpu
COPY pyproject.toml requirements.lock ./
COPY ionic_mpnn_tpu ./ionic_mpnn_tpu
COPY scripts ./scripts
COPY bench.py ./

# exact validated versions (see requirements.lock); TPU wheel set
RUN pip install --no-cache-dir \
    "jax[tpu]==0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax==0.12.3 optax==0.2.6 orbax-checkpoint==0.11.32 chex==0.1.91 \
    einops==0.8.2 numpy==2.0.2 scikit-learn==1.9.0 matplotlib==3.10.8 \
    && pip install --no-cache-dir -e .

# smoke: build the native packer + import the package
RUN python -c "import ionic_mpnn_tpu; from ionic_mpnn_tpu import native; native.native_available()"

ENTRYPOINT ["python"]
CMD ["scripts/train_viscosity.py", "--help"]

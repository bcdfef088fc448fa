# Deployment image for camradepth_tpu (TPU VM host).
# Counterpart of the reference's CUDA Dockerfile (reference Dockerfile:1-35)
# targeting Cloud TPU: JAX with the TPU runtime instead of torch+CUDA.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY camradepth_tpu ./camradepth_tpu
COPY native ./native
COPY bench.py ./

# TPU-enabled jax; the devkit extra is only needed for offline dataprep.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir .

# Pre-build the native host rasterizer.
RUN g++ -O3 -shared -fPIC -std=c++17 \
        -o native/librasterize.so native/rasterize.cc

ENTRYPOINT ["camradepth"]
CMD ["--help"]

# TPU-VM image for gluefactory_tpu (reference `Dockerfile` analog).
FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY gluefactory_tpu ./gluefactory_tpu
COPY native ./native
COPY tools ./tools
COPY bench.py ./

# TPU wheel: install the libtpu-bundled jax build
RUN pip install --no-cache-dir "jax[tpu]" \
      -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .[train]

# prebuild the native LO-RANSAC
RUN g++ -O3 -shared -fPIC -o native/liblo_ransac.so native/lo_ransac.cpp

ENTRYPOINT ["python", "-m", "gluefactory_tpu.train"]

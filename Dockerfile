# flowtron_tpu runtime image (TPU VM host).
# The base provides python3 + libtpu; jax[tpu] supplies the compiler stack.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/flowtron_tpu
COPY . .

RUN pip install --no-cache-dir "jax[tpu]" -f \
        https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -r requirements.txt \
    && pip install --no-cache-dir -e . \
    && sh flowtron_tpu/native/build.sh

ENTRYPOINT ["flowtron-train"]
CMD ["-c", "config.json"]

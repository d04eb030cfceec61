# Service image: REST API over the TPU-native vector engine.
# (CPU works too — JAX falls back; for TPU runtime use a TPU VM base image.)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY alayalite_tpu ./alayalite_tpu
RUN pip install --no-cache-dir -e .[service] jax flax pandas

ENV ALAYALITE_DATA_DIR=/data
VOLUME /data
EXPOSE 8000
CMD ["python", "-m", "alayalite_tpu.service.app", "--port", "8000"]

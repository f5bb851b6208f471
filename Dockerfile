# Deployment image — Grand-Challenge algorithm contract, TPU-native build.
# Mirrors the reference packaging (reference Dockerfile:1-93): non-root
# user, /input + /output mount points, processor.py entrypoint, resource
# labels. The base swaps CUDA for a JAX TPU wheel set.
FROM python:3.12-slim

RUN groupadd -r algorithm && useradd -m --no-log-init -r -g algorithm algorithm \
    && mkdir -p /opt/algorithm /input /output \
    && chown algorithm:algorithm /opt/algorithm /input /output

USER algorithm
WORKDIR /opt/algorithm
ENV PATH="/home/algorithm/.local/bin:${PATH}"

RUN python -m pip install --user -U pip

COPY --chown=algorithm:algorithm install_files/requirements.txt /opt/algorithm/
RUN python -m pip install --user -r requirements.txt

COPY --chown=algorithm:algorithm bodyct_dram_emph_subtype_tpu/ /opt/algorithm/bodyct_dram_emph_subtype_tpu/
COPY --chown=algorithm:algorithm conf/ /opt/algorithm/conf/
COPY --chown=algorithm:algorithm processor.py train.py test.py bench.py /opt/algorithm/
# model weights: torch best.ckpt (imported greedily) or an orbax dir
# COPY --chown=algorithm:algorithm best.ckpt /opt/algorithm/

ENTRYPOINT ["python", "-m", "processor"]

## ALGORITHM LABELS ##
LABEL nl.diagnijmegen.rse.algorithm.name=dram_emph_subtype_tpu
LABEL nl.diagnijmegen.rse.algorithm.hardware.cpu.count=2
LABEL nl.diagnijmegen.rse.algorithm.hardware.memory=32G
LABEL nl.diagnijmegen.rse.algorithm.hardware.tpu.count=1

#!/bin/bash
# Run the ddlo-tpu container on a TPU VM (reference: docker/run.sh).
# TPU access needs privileged mode + the host network for libtpu.
docker run --net=host -it --rm \
           --privileged \
           -v "$(pwd)":/data -w /data \
           "$@" \
           ddlo-tpu

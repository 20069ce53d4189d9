#!/bin/bash
# Build the ddlo-tpu image from the repo root (reference: docker/build.sh)
cd "$(dirname "$0")/.." && docker build --tag ddlo-tpu -f docker/Dockerfile "$@" .

#!/bin/bash
set -e
python -m frustum_convnet_tpu.engine.train --cfg cfgs/det_sample.yaml OUTPUT_DIR output/car_train "$@"

#!/bin/bash
set -e
python -m frustum_convnet_tpu.engine.train --cfg cfgs/refine_car.yaml OUTPUT_DIR output/car_train_refine "$@"

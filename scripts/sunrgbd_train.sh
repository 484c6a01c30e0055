#!/bin/bash
# SUN-RGBD: train, then eval both from GT 2D boxes and from RGB detections.
set -e
python -m frustum_convnet_tpu.engine.train --cfg cfgs/det_sample_sunrgbd.yaml OUTPUT_DIR output/sunrgbd_train
python -m frustum_convnet_tpu.engine.test_sunrgbd --cfg cfgs/det_sample_sunrgbd.yaml \
    OUTPUT_DIR output/sunrgbd_train TEST.WEIGHTS output/sunrgbd_train/checkpoints/model_best.msgpack \
    FROM_RGB_DET False OVER_WRITE_TEST_FILE ''
python -m frustum_convnet_tpu.engine.test_sunrgbd --cfg cfgs/det_sample_sunrgbd.yaml \
    OUTPUT_DIR output/sunrgbd_train TEST.WEIGHTS output/sunrgbd_train/checkpoints/model_best.msgpack \
    FROM_RGB_DET True

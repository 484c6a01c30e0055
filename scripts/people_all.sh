#!/bin/bash
# KITTI Pedestrian+Cyclist pipeline: stage-1 + refinement.
set -e
DATA_ROOT=${DATA_ROOT:-data/kitti}

python -m frustum_convnet_tpu.data.kitti.prepare --people_only --gen_train --gen_val --gen_val_rgb_detection --data_root "$DATA_ROOT"

python -m frustum_convnet_tpu.engine.train --cfg cfgs/det_sample_people.yaml OUTPUT_DIR output/people_train
python -m frustum_convnet_tpu.engine.test --cfg cfgs/det_sample_people.yaml \
    --gt_dir "$DATA_ROOT/training/label_2" --idx_path "$DATA_ROOT/image_sets/val.txt" \
    OUTPUT_DIR output/people_train TEST.WEIGHTS output/people_train/checkpoints/model_best.msgpack

python -m frustum_convnet_tpu.data.kitti.prepare_refine --people_only --gen_train --gen_val_rgb_detection \
    --data_root "$DATA_ROOT" --val_res_dir output/people_train/val_nms/result/data

python -m frustum_convnet_tpu.engine.train --cfg cfgs/refine_people.yaml OUTPUT_DIR output/people_train_refine
python -m frustum_convnet_tpu.engine.test --cfg cfgs/refine_people.yaml \
    --gt_dir "$DATA_ROOT/training/label_2" --idx_path "$DATA_ROOT/image_sets/val.txt" \
    OUTPUT_DIR output/people_train_refine TEST.WEIGHTS output/people_train_refine/checkpoints/model_best.msgpack

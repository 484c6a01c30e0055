#!/bin/bash
# Full KITTI Car pipeline: stage-1 prepare -> train -> test, then the
# refinement cascade (equivalent of the reference's scripts/car_all.sh flow).
set -e
DATA_ROOT=${DATA_ROOT:-data/kitti}

python -m frustum_convnet_tpu.data.kitti.prepare --car_only --gen_train --gen_val --gen_val_rgb_detection --data_root "$DATA_ROOT"

python -m frustum_convnet_tpu.engine.train --cfg cfgs/det_sample.yaml OUTPUT_DIR output/car_train
python -m frustum_convnet_tpu.engine.test --cfg cfgs/det_sample.yaml \
    --gt_dir "$DATA_ROOT/training/label_2" --idx_path "$DATA_ROOT/image_sets/val.txt" \
    OUTPUT_DIR output/car_train TEST.WEIGHTS output/car_train/checkpoints/model_best.msgpack

python -m frustum_convnet_tpu.data.kitti.prepare_refine --car_only --gen_train --gen_val_rgb_detection \
    --data_root "$DATA_ROOT" --val_res_dir output/car_train/val_nms/result/data

python -m frustum_convnet_tpu.engine.train --cfg cfgs/refine_car.yaml OUTPUT_DIR output/car_train_refine
python -m frustum_convnet_tpu.engine.test --cfg cfgs/refine_car.yaml \
    --gt_dir "$DATA_ROOT/training/label_2" --idx_path "$DATA_ROOT/image_sets/val.txt" \
    OUTPUT_DIR output/car_train_refine TEST.WEIGHTS output/car_train_refine/checkpoints/model_best.msgpack

# Recipes for the TPU-native APDe-MVS framework (reference justfile parity).

default:
    @just --list

# build the native host runtime
native:
    make -C native

test:
    python -m pytest tests/ -q

bench:
    python bench.py

# reconstruct a single scan
run-scan dense_folder dataset="General":
    python -m apde_mvs_tpu.cli.apd --dense_folder {{dense_folder}} --dataset {{dataset}}

# normalize a scan's image layout
prep-scene scan_dir:
    python -m apde_mvs_tpu.cli.prepare_scene --scan_dir {{scan_dir}}

# COLMAP sparse model -> MVSNet scene
convert-colmap dense_folder save_folder *args:
    python -m apde_mvs_tpu.datasets.colmap --dense_folder {{dense_folder}} --save_folder {{save_folder}} {{args}}

# batch reconstruction over a dataset root
reconstruct data_dir *args:
    python -m apde_mvs_tpu.cli.run --data_dir {{data_dir}} {{args}}

eval-eth data_dir gt_dir *args:
    python -m apde_mvs_tpu.tools.eval_eth --data_dir {{data_dir}} --gt_dir {{gt_dir}} {{args}}

# ETH3D training-set pipeline: normalize -> convert -> run -> fuse -> eval
eth3d-train eth3d_dir work_dir gt_dir *args:
    python -m apde_mvs_tpu.tools.eth3d_train --eth3d_dir {{eth3d_dir}} --work_dir {{work_dir}} --gt_dir {{gt_dir}} {{args}}

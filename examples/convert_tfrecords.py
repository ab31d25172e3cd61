"""Convert paired clean/noisy images into fold-sharded TFRecords.

Mirrors ``Convert_tfrecords.ipynb`` (cells 0-3): pair ``{root}/clean`` and
``{root}/noisy`` by sorted order, KFold(5, seed=42), write
``ssid_fold_{k}_{idx}-{count}.tfrec`` shards capped at ``--max_mb`` with the
item count in the filename (the contract ``count_data_items`` reads).  No
TensorFlow or benatools needed — the first-party codec (+ optional C++ fast
path) writes the exact wire format.

    python examples/convert_tfrecords.py --input_folder data/ssid \
        --output_folder tfrec --max_mb 1000
"""
from __future__ import annotations

import argparse
import glob
import os

import cv2

from vit_unet_tpu.data.datasets import kfold_split
from vit_unet_tpu.data.tfrecord import convert, count_data_items


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_folder", required=True)
    p.add_argument("--output_folder", default="tfrec")
    p.add_argument("--prefix", default="ssid_fold")
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--max_mb", type=int, default=1000)
    args = p.parse_args(argv)

    clean = sorted(glob.glob(os.path.join(args.input_folder, "clean", "*")))
    noisy = sorted(glob.glob(os.path.join(args.input_folder, "noisy", "*")))
    assert len(clean) == len(noisy) and clean, "unpaired clean/noisy folders"

    def serialize(pair):
        cp, np_ = pair
        x = cv2.cvtColor(cv2.imread(np_), cv2.COLOR_BGR2RGB)   # x = noisy
        y = cv2.cvtColor(cv2.imread(cp), cv2.COLOR_BGR2RGB)    # y = clean
        return {"x": x.tobytes(), "y": y.tobytes()}

    if args.folds < 2:   # single shard group: everything in fold 0
        fold_indices = [range(len(clean))]
    else:
        fold_indices = [val for _, val in
                        kfold_split(len(clean), args.folds)]
    all_paths = []
    for k, val_idx in enumerate(fold_indices):
        items = [(clean[i], noisy[i]) for i in val_idx]
        paths = convert(items, args.output_folder, f"{args.prefix}_{k}_",
                        serialize, max_mb=args.max_mb)
        print(f"fold {k}: {len(items)} pairs -> {paths}")
        all_paths += paths
    print(f"total items (from filenames): {count_data_items(all_paths)}")


if __name__ == "__main__":
    main()

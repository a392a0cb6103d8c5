"""Dataset relinker: symlink-farm ColoRadar subdirs into a working dir
(reference ``dataset_preprocessor/relink_coloradar.py:9-30``)."""
from __future__ import annotations

import argparse
from pathlib import Path

BASE_DIR_NAMES = ["cascade", "groundtruth", "imu", "lidar", "single_chip"]
EXCLUDE_DIR_NAMES = ["ColoRadar_tools-master", "zip"]
SPECIAL_DIR_NAMES = ["calib"]


def create_baselink(src_dir: Path, dst_dir: Path) -> int:
    seq_dirs = [
        d
        for d in src_dir.iterdir()
        if d.is_dir() and d.name not in EXCLUDE_DIR_NAMES and d.name not in SPECIAL_DIR_NAMES
    ]
    print(f"Found {len(seq_dirs)} sequences in {src_dir}")
    for seq_dir in seq_dirs:
        dst_seq = dst_dir / seq_dir.name
        dst_seq.mkdir(parents=True, exist_ok=True)
        for name in BASE_DIR_NAMES:
            dst = dst_seq / name
            if not dst.exists():
                dst.symlink_to(seq_dir / name, target_is_directory=True)
    for name in SPECIAL_DIR_NAMES:
        dst = dst_dir / name
        if not dst.exists():
            dst.symlink_to(src_dir / name, target_is_directory=True)
    return len(seq_dirs)


def main(argv=None):
    parser = argparse.ArgumentParser("RaLD-TPU dataset relinker")
    parser.add_argument("--src", required=True, type=str)
    parser.add_argument("--dst", required=True, type=str)
    args = parser.parse_args(argv)
    create_baselink(Path(args.src), Path(args.dst))


if __name__ == "__main__":
    main()

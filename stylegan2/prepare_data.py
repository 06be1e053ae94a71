"""Prepare FFHQ images for training.

CLI parity with reference stylegan2/prepare_data.py (image dir ->
multi-resolution store at sizes 128,256,512,1024). The store is a flat
uint8 .npy per resolution (see diagan_tpu.data.ffhq) instead of LMDB,
which is unavailable here; pass --out pointing at the dataset root.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from diagan_tpu.data.ffhq import prepare_npy  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    # reference surface: --out and --path are plain options with no
    # default/required (reference stylegan2/prepare_data.py:74,93) — it
    # crashes later when omitted; we error with a message instead
    parser.add_argument("--out", type=str,
                        help="output dataset root (dir for the .npy store)")
    parser.add_argument("--size", type=str, default="128,256,512,1024")
    parser.add_argument("--n_worker", type=int, default=8)  # CLI compat
    parser.add_argument("--resample", type=str, default="lanczos")
    parser.add_argument("--path", type=str, help="path to the image dataset")
    args = parser.parse_args()

    if not args.path or not args.out:
        parser.error("--path and --out are required")
    sizes = tuple(int(s) for s in args.size.split(","))
    prepare_npy(args.path, args.out, sizes=sizes)
    print(f"wrote {[f'ffhq_{s}.npy' for s in sizes]} to {args.out}")


if __name__ == "__main__":
    main()

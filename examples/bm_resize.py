"""Image-preprocessing micro-benchmark (reference example/src/bm_resize.rs).

Times the VLM preprocessing pipeline — smart-resize (round-to-nearest
patch-multiple, pixel-budget clamp) + PIL-BICUBIC-matching resample +
normalize + merge-block-major patch layout — the per-request host cost in
front of every vision model.

Usage: python examples/bm_resize.py [image.jpg] [--reps 20]
Without an image argument a synthetic 1280x960 RGB gradient is used.
"""

import argparse
import sys
import time

import numpy as np

from crane_tpu.models.image_processing import preprocess_image, smart_resize

ap = argparse.ArgumentParser()
ap.add_argument("image", nargs="?", default=None)
ap.add_argument("--reps", type=int, default=20)
args = ap.parse_args()

if args.image:
    from PIL import Image

    img = np.asarray(Image.open(args.image).convert("RGB"))
else:
    h, w = 960, 1280
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([(xx * 255 // w), (yy * 255 // h),
                    ((xx + yy) * 255 // (h + w))], -1).astype(np.uint8)

H, W = img.shape[:2]
rh, rw = smart_resize(H, W)
print(f"input {H}x{W} -> smart_resize {rh}x{rw}")

patches, grid = preprocess_image(img)
print(f"patches {patches.shape}, grid (t,h,w)={grid}")

t0 = time.perf_counter()
for _ in range(args.reps):
    preprocess_image(img)
dt = (time.perf_counter() - t0) / args.reps
mpix = H * W / 1e6
print(f"{dt * 1e3:.2f} ms/image ({mpix / dt:.1f} Mpix/s) over {args.reps} reps")
sys.exit(0)

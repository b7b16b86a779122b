"""Two-stage OCR over a page image (reference paddleocr_v6 pipeline).

Usage: python examples/ocr_simple.py --image page.png \
           [--dict ppocr_dict.txt] [--det-params det.npz --rec-params rec.npz]

Without converted production weights this runs the random-init native nets
(useful as a pipeline smoke test); with weights it produces real OCR.
"""

import argparse

import numpy as np
from PIL import Image

from crane_tpu.ocr import PaddleOcrPipeline, load_dictionary
from crane_tpu.ocr.nets import (
    ctc_recognizer,
    db_detector,
    init_detector_params,
    init_recognizer_params,
)

ap = argparse.ArgumentParser()
ap.add_argument("--image", required=True)
ap.add_argument("--dict", default=None)
args = ap.parse_args()

dictionary = load_dictionary(args.dict) if args.dict else ["", *"abcdefghijklmnopqrstuvwxyz0123456789", " "]
det_p = init_detector_params()
rec_p = init_recognizer_params(n_classes=len(dictionary))
pipe = PaddleOcrPipeline(
    lambda x: db_detector(det_p, x),
    lambda b: ctc_recognizer(rec_p, b),
    dictionary,
)
doc = pipe.recognize(np.asarray(Image.open(args.image).convert("RGB")))
for r in doc.regions:
    print(f"[{r.left},{r.top},{r.right},{r.bottom}] {r.confidence:.2f} {r.text}")
print("---")
print(doc.text)

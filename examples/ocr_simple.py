"""Two-stage OCR over a page image (reference paddleocr_v6 pipeline).

Usage: python examples/ocr_simple.py --image page.png \
           [--model-path /path/to/PaddleOCRv6] [--dict ppocr_dict.txt]

With --model-path holding the released pp-ocrv6_small_{det,rec}.onnx +
ppocrv6_dict.txt this runs real production OCR through the crane_tpu.onnx
evaluator; without it, the random-init native nets (pipeline smoke test).
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
ap.add_argument("--model-path", default=None)
ap.add_argument("--dict", default=None)
args = ap.parse_args()

if args.model_path:
    from crane_tpu.ocr.pipeline import load_paddleocr_onnx

    pipe = load_paddleocr_onnx(args.model_path)
else:
    pipe = None

dictionary = load_dictionary(args.dict) if args.dict else ["", *"abcdefghijklmnopqrstuvwxyz0123456789", " "]
det_p = init_detector_params()
rec_p = init_recognizer_params(n_classes=len(dictionary))
if pipe is None:
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

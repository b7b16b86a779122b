"""Image chat with Qwen3-VL (reference example/src/{vision_simple,
qwen3_5_vl_simple}.rs).

Usage: python examples/vlm_simple.py --model-path /path/to/Qwen3-VL --image photo.jpg
"""

import argparse

from PIL import Image

from crane_tpu.generation.config import GenerationConfig
from crane_tpu.generation.streamer import TextStreamer
from crane_tpu.models.image_processing import preprocess_image
from crane_tpu.models.qwen3_vl import load_qwen3_vl

ap = argparse.ArgumentParser()
ap.add_argument("--model-path", required=True)
ap.add_argument("--image", required=True)
ap.add_argument("--prompt", default="Describe this image.")
args = ap.parse_args()

vlm = load_qwen3_vl(args.model_path)
vc = vlm.vision_config
patches, grid = preprocess_image(
    Image.open(args.image), patch_size=vc.patch_size,
    merge_size=vc.spatial_merge_size, temporal_patch_size=vc.temporal_patch_size,
)
n_pads = grid[0] * (grid[1] // vc.spatial_merge_size) * (grid[2] // vc.spatial_merge_size)
prompt = (
    "<|im_start|>user\n<|vision_start|>" + "<|image_pad|>" * n_pads
    + f"<|vision_end|>{args.prompt}<|im_end|>\n<|im_start|>assistant\n"
)
ids = vlm.tokenizer.encode(prompt)
vlm.generate(
    ids, images=[(patches, grid)],
    gen=GenerationConfig.greedy(512, eos_token_ids=tuple(vlm.eos_token_ids)),
    streamer=TextStreamer(vlm.tokenizer),
)
print()

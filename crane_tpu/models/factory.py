"""Model factory: pick the right loader from a checkpoint's config.

Reference behavior: crane-core's model detection cascade chooses a backend
from the checkpoint contents (model_factory — SURVEY.md §2.3/§2.9: config
fields for safetensors, the GGUF header for .gguf files). Here: GGUF files
route to the GGUF loader; HF directories dispatch on ``model_type`` —
multimodal configs to the VLM, Gemma3n to its standalone stack, everything
else to the shared dense/hybrid causal LM.
"""

from __future__ import annotations

import os


def detect_model_type(path: str) -> str:
    """'gguf' | the HF config.json model_type."""
    if path.endswith(".gguf") or os.path.isfile(path):
        return "gguf"
    from crane_tpu.models.auto import load_hf_config

    return load_hf_config(path).get("model_type", "llama")


def load_model(path: str, **kwargs):
    """Load whatever lives at ``path`` with the appropriate model class.

    Returns one of: CausalLM (text LMs incl. hybrid GDN/MoE), Qwen3VLModel,
    Gemma3VLModel wrapper, Gemma3nLM, or the GGUF-backed CausalLM.
    """
    mt = detect_model_type(path)
    if mt == "gguf":
        from crane_tpu.loaders.gguf_model import from_gguf

        return from_gguf(path, **kwargs)
    if mt == "qwen3_vl":
        from crane_tpu.models.qwen3_vl import load_qwen3_vl

        return load_qwen3_vl(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    if mt == "gemma3" :
        from crane_tpu.models.auto import load_hf_config

        if "vision_config" in load_hf_config(path):
            from crane_tpu.models.gemma3_vl import load_gemma3_vl

            return load_gemma3_vl(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    if mt in ("gemma3n", "gemma3n_text"):
        from crane_tpu.models.gemma3n import from_pretrained as g3n

        return g3n(path, **{k: v for k, v in kwargs.items() if k in ("dtype", "max_seq")})
    if mt in ("paddleocr_vl", "paddleocr"):
        from crane_tpu.models.paddleocr_vl import load_paddleocr_vl

        return load_paddleocr_vl(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    if mt == "qwen3_tts":
        from crane_tpu.models.qwen3_tts import load_qwen3_tts

        return load_qwen3_tts(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    if mt in ("qwen3_asr", "qwen3_omni_moe_asr"):
        from crane_tpu.models.qwen3_asr import load_qwen3_asr

        return load_qwen3_asr(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    if mt == "qwen2_audio":
        from crane_tpu.models.qwen2_audio import load_qwen2_audio

        return load_qwen2_audio(path, **{k: v for k, v in kwargs.items() if k == "dtype"})
    from crane_tpu.models.auto import from_pretrained

    return from_pretrained(path, **kwargs)

"""Shared test fixtures: tiny real checkpoints with tokenizer + chat template."""

import json
import os

CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{ '<|im_start|>' + message.role + '\n' + message.content + '<|im_end|>\n' }}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}{% endif %}"
)


def make_tiny_tokenizer(dirpath: str, vocab_size: int = 400, extra_tokens=()):
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<|im_start|>", "<|im_end|>", "<|endoftext|>", *extra_tokens],
    )
    tok.train_from_iterator(
        ["hello world how are you today? fine thanks. the weather is nice."] * 20,
        trainer,
    )
    os.makedirs(dirpath, exist_ok=True)
    tok.save(os.path.join(dirpath, "tokenizer.json"))
    with open(os.path.join(dirpath, "tokenizer_config.json"), "w") as f:
        json.dump(
            {"eos_token": "<|im_end|>", "chat_template": CHATML_TEMPLATE}, f
        )
    return tok


def make_tiny_qwen3_checkpoint(dirpath: str, *, vocab_size: int | None = None):
    """Random-weight Qwen3 checkpoint + trained tokenizer in one directory."""
    import torch
    import transformers

    tok = make_tiny_tokenizer(dirpath)
    torch.manual_seed(0)
    cfg = transformers.Qwen3Config(
        vocab_size=vocab_size or tok.get_vocab_size(),
        hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    transformers.Qwen3ForCausalLM(cfg).save_pretrained(dirpath, safe_serialization=True)
    return dirpath

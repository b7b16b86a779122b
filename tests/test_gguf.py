"""GGUF parser + dequantization tests.

A minimal GGUF v3 writer lives here to produce fixtures; dequant kernels are
checked by quantize->dequantize roundtrip error bounds (the reference's
correctness bar for quant paths is byte-comparable generation, exercised at
the model level)."""

import struct

import numpy as np
import pytest

from crane_tpu.loaders.gguf import (
    GGML_F16,
    GGML_F32,
    GGML_Q4_0,
    GGML_Q8_0,
    GGUFReader,
    dequantize,
    quantize_q4_0,
    quantize_q8_0,
)


def _w_str(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _w_value(v) -> bytes:
    if isinstance(v, bool):
        return struct.pack("<I", 7) + struct.pack("<B", int(v))
    if isinstance(v, int):
        return struct.pack("<I", 4) + struct.pack("<I", v)
    if isinstance(v, float):
        return struct.pack("<I", 6) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", 8) + _w_str(v)
    if isinstance(v, list):
        if all(isinstance(x, str) for x in v):
            body = b"".join(_w_str(x) for x in v)
            return struct.pack("<I", 9) + struct.pack("<IQ", 8, len(v)) + body
        if all(isinstance(x, int) for x in v):
            body = b"".join(struct.pack("<i", x) for x in v)
            return struct.pack("<I", 9) + struct.pack("<IQ", 5, len(v)) + body
    raise TypeError(type(v))


def write_gguf(path, metadata: dict, tensors: dict):
    """tensors: name -> (ggml_type, logical_shape_rowmajor, raw_bytes)"""
    align = 32
    header = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    kv = b"".join(_w_str(k) + _w_value(v) for k, v in metadata.items())
    infos, blobs, off = b"", [], 0
    for name, (gt, shape, raw) in tensors.items():
        ggml_shape = tuple(reversed(shape))
        infos += _w_str(name) + struct.pack("<I", len(ggml_shape))
        for d in ggml_shape:
            infos += struct.pack("<Q", d)
        infos += struct.pack("<IQ", gt, off)
        blobs.append(raw)
        off += (len(raw) + align - 1) // align * align
    head = header + kv + infos
    pad0 = (-len(head)) % align
    with open(path, "wb") as f:
        f.write(head + b"\0" * pad0)
        for raw in blobs:
            f.write(raw)
            f.write(b"\0" * ((-len(raw)) % align))
    return path


class TestRoundTrip:
    def test_q8_0(self):
        x = np.random.default_rng(0).standard_normal(256).astype(np.float32)
        raw = quantize_q8_0(x)
        got = dequantize(np.frombuffer(raw, np.uint8), GGML_Q8_0, 256)
        err = np.abs(got - x).max()
        assert err <= np.abs(x).max() / 127 * 1.01 + 1e-3

    def test_q4_0(self):
        x = np.random.default_rng(1).standard_normal(256).astype(np.float32)
        raw = quantize_q4_0(x)
        got = dequantize(np.frombuffer(raw, np.uint8), GGML_Q4_0, 256)
        # 4-bit: coarse but bounded
        err = np.abs(got - x).max()
        assert err <= np.abs(x).max() / 7
        assert np.corrcoef(got, x)[0, 1] > 0.98

    def test_f16_bf16(self):
        from crane_tpu.loaders.gguf import GGML_BF16

        x = np.random.default_rng(2).standard_normal(64).astype(np.float32)
        raw16 = x.astype(np.float16).tobytes()
        got = dequantize(np.frombuffer(raw16, np.uint8), GGML_F16, 64)
        np.testing.assert_allclose(got, x, atol=2e-3)
        rawbf = (x.view(np.uint32) >> 16).astype(np.uint16).tobytes()
        gotbf = dequantize(np.frombuffer(rawbf, np.uint8), GGML_BF16, 64)
        np.testing.assert_allclose(gotbf, x, atol=2e-2, rtol=1e-2)


class TestReader:
    def test_metadata_and_tensors(self, tmp_path):
        x = np.arange(64, dtype=np.float32).reshape(8, 8)
        q = np.random.default_rng(3).standard_normal((4, 32)).astype(np.float32)
        path = write_gguf(
            str(tmp_path / "t.gguf"),
            {
                "general.architecture": "qwen3",
                "general.alignment": 32,
                "qwen3.block_count": 2,
                "qwen3.embedding_length": 64,
                "tokenizer.ggml.tokens": ["<unk>", "a", "b"],
                "tokenizer.chat_template": "{{ messages }}",
            },
            {
                "dense.weight": (GGML_F32, x.shape, x.tobytes()),
                "quant.weight": (GGML_Q8_0, q.shape, quantize_q8_0(q).tobytes()),
            },
        )
        r = GGUFReader(path)
        assert r.architecture == "qwen3"
        assert r.field("block_count") == 2
        assert r.metadata["tokenizer.ggml.tokens"] == ["<unk>", "a", "b"]
        np.testing.assert_array_equal(r.tensor("dense.weight"), x)
        dq = r.tensor("quant.weight")
        assert dq.shape == (4, 32)
        assert np.abs(dq - q).max() < np.abs(q).max() / 100

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.gguf"
        p.write_bytes(b"NOPE" + b"\0" * 100)
        with pytest.raises(ValueError, match="not a GGUF"):
            GGUFReader(str(p))


class TestKQuants:
    """q4_k/q6_k dequant: verified against llama.cpp's reference layout by
    construction; here we check structural invariants on synthetic blocks."""

    def test_q4_k_scale_layout(self):
        from crane_tpu.loaders.gguf import GGML_Q4_K

        # one super-block: d=1, dmin=0, all scales=1, nibbles = pattern
        block = np.zeros(144, np.uint8)
        block[0:2] = np.frombuffer(np.float16(1.0).tobytes(), np.uint8)
        block[2:4] = np.frombuffer(np.float16(0.0).tobytes(), np.uint8)
        block[4:8] = 1  # scales[0..3] = 1
        block[8:12] = 0  # mins[0..3] = 0
        block[12:16] = 0x11  # scales[4..7]=1 (low nibble), mins[4..7]=1? no: min nibble=1*?
        block[12:16] = 0x01  # scales[4..7] = 1, mins[4..7] = 0
        qs = np.arange(128, dtype=np.uint8) % 16
        block[16:144] = qs | (qs << 4)
        out = dequantize(block, GGML_Q4_K, 256)
        assert out.shape == (256,)
        # sub-block 0 low nibbles scale 1: first 32 values = pattern
        np.testing.assert_array_equal(out[:32], (np.arange(32) % 16).astype(np.float32))

    def test_q6_k_identity(self):
        from crane_tpu.loaders.gguf import GGML_Q6_K

        block = np.zeros(210, np.uint8)
        # ql = 0, qh = 0 -> q = -32 everywhere; scales=1, d=1 -> out = -32
        block[192:208] = 1
        block[208:210] = np.frombuffer(np.float16(1.0).tobytes(), np.uint8)
        out = dequantize(block, GGML_Q6_K, 256)
        np.testing.assert_array_equal(out, np.full(256, -32.0, np.float32))


class TestGgufTokenizer:
    def _tok(self, meta):
        from crane_tpu.loaders.gguf_model import tokenizer_from_gguf

        class FakeReader:
            metadata = meta
        return tokenizer_from_gguf(FakeReader())

    def test_spm_llama_vocab(self):
        """tokenizer.ggml.model == 'llama' is a sentencepiece vocab (scores,
        U+2581 word starts, byte fallback) — must NOT be fed to ByteLevel
        BPE (which produced garbage single-char ids)."""
        tokens = ["<unk>", "<s>", "</s>"]
        tokens += [f"<0x{i:02X}>" for i in range(256)]
        base = len(tokens)
        tokens += ["▁hello", "▁world", "▁", "hello", "lo"]
        scores = [0.0] * base + [-1.0, -1.5, -10.0, -3.0, -4.0]
        t = self._tok({
            "tokenizer.ggml.model": "llama",
            "tokenizer.ggml.tokens": tokens,
            "tokenizer.ggml.scores": scores,
            "tokenizer.ggml.token_type": [2, 3, 3] + [6] * 256 + [1] * 5,
            "tokenizer.ggml.bos_token_id": 1,
            "tokenizer.ggml.eos_token_id": 2,
            "tokenizer.ggml.unknown_token_id": 0,
            "tokenizer.ggml.add_bos_token": True,
        })
        ids = t.encode("hello world", add_special_tokens=False)
        assert ids == [base, base + 1]  # whole-word SPM pieces
        assert t.decode(ids) == "hello world"
        # byte fallback for characters outside the vocab
        ids2 = t.encode("helloé", add_special_tokens=False)
        assert all(i < len(tokens) for i in ids2) and len(ids2) >= 2
        # add_bos_token honored on plain encode
        assert t.encode("hello world")[0] == 1

    def test_bpe_path_unchanged(self):
        t = self._tok({
            "tokenizer.ggml.model": "gpt2",
            "tokenizer.ggml.tokens": ["h", "e", "l", "o", "he", "ll", "hell", "hello"],
            "tokenizer.ggml.merges": ["h e", "l l", "he ll", "hell o"],
            "tokenizer.ggml.token_type": [1] * 8,
        })
        assert t.encode("hello", add_special_tokens=False) == [7]

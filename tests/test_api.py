"""HTTP API tests: OpenAI + SGLang endpoints over a live engine.

Mirrors the reference's E2E shell tests (start server, send request, check
response — SURVEY.md §4) using aiohttp's in-process test client."""

import asyncio
import json

import jax.numpy as jnp
import pytest

from tests.fixtures import make_tiny_qwen3_checkpoint


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from crane_tpu.models.auto import from_pretrained
    from crane_tpu.serve.api import Server, build_app
    from crane_tpu.serve.engine import InferenceEngine

    d = make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("ckpt") / "m"))
    lm = from_pretrained(d, dtype=jnp.float32)
    engine = InferenceEngine(lm, max_slots=2, max_seq_len=256, decode_tokens_per_seq=2)
    engine.start()
    server = Server(engine, model_name="tiny-qwen3")
    yield lambda: build_app(server)  # fresh app per test (apps freeze on start)
    engine.stop()


def _run(app_factory, fn):
    from aiohttp.test_utils import TestClient, TestServer

    async def go():
        client = TestClient(TestServer(app_factory()))
        await client.start_server()
        try:
            return await fn(client)
        finally:
            await client.close()

    return asyncio.run(go())


class TestEndpoints:
    def test_health(self, served):
        async def fn(c):
            r = await c.get("/health")
            assert r.status == 200
            return await r.json()

        assert _run(served, fn)["status"] == "ok"

    def test_models(self, served):
        async def fn(c):
            r = await c.get("/v1/models")
            body = await r.json()
            assert body["data"][0]["id"] == "tiny-qwen3"
            r2 = await c.get("/v1/models/tiny-qwen3")
            assert r2.status == 200
            r3 = await c.get("/v1/models/nope")
            assert r3.status == 404

        _run(served, fn)

    def test_tokenize_roundtrip(self, served):
        async def fn(c):
            r = await c.post("/tokenize", json={"text": "hello world"})
            toks = (await r.json())["tokens"]
            assert len(toks) > 0
            r2 = await c.post("/detokenize", json={"tokens": toks})
            assert (await r2.json())["text"] == "hello world"

        _run(served, fn)

    def test_chat_completion(self, served):
        async def fn(c):
            r = await c.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny-qwen3",
                    "messages": [{"role": "user", "content": "hello"}],
                    "max_tokens": 8,
                    "temperature": 0,
                },
            )
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "chat.completion"
            assert body["choices"][0]["message"]["role"] == "assistant"
            assert body["usage"]["completion_tokens"] > 0
            return body

        _run(served, fn)

    def test_chat_streaming_sse(self, served):
        async def fn(c):
            r = await c.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 6,
                    "temperature": 0,
                    "stream": True,
                    "stream_options": {"include_usage": True},
                },
            )
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = (await r.read()).decode()
            events = [
                json.loads(line[6:])
                for line in raw.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            # role-announce first chunk
            assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
            finishes = [
                e for e in events
                if e.get("choices") and e["choices"][0]["finish_reason"]
            ]
            assert finishes, raw
            usage = [e for e in events if e.get("usage")]
            assert usage and usage[0]["usage"]["completion_tokens"] > 0
            assert raw.rstrip().endswith("data: [DONE]")

        _run(served, fn)

    def test_completions(self, served):
        async def fn(c):
            r = await c.post(
                "/v1/completions",
                json={"prompt": "hello world", "max_tokens": 4, "temperature": 0},
            )
            body = await r.json()
            assert body["object"] == "text_completion"
            assert body["usage"]["completion_tokens"] == 4

        _run(served, fn)

    def test_sglang_generate(self, served):
        async def fn(c):
            r = await c.post(
                "/generate",
                json={
                    "text": "hello",
                    "sampling_params": {"max_new_tokens": 4, "temperature": 0},
                },
            )
            body = await r.json()
            assert "text" in body
            assert body["meta_info"]["completion_tokens"] == 4

        _run(served, fn)

    def test_sglang_info_and_stats(self, served):
        async def fn(c):
            r = await c.get("/model_info")
            assert (await r.json())["is_generation"] is True
            r2 = await c.get("/server_info")
            info = await r2.json()
            assert info["max_num_reqs"] == 2
            r3 = await c.get("/v1/stats")
            snap = await r3.json()
            assert snap["requests_completed"] >= 1
            r4 = await c.post("/flush_cache")
            assert (await r4.json())["status"] == "ok"

        _run(served, fn)

    def test_abort_request_endpoint(self, served):
        async def fn(c):
            r = await c.post("/abort_request", json={"rid": "nonexistent"})
            assert r.status == 200
            r2 = await c.post("/abort_request", json={})
            assert r2.status == 400

        _run(served, fn)

    def test_prompt_too_long_400(self, served):
        async def fn(c):
            r = await c.post(
                "/v1/completions",
                json={"prompt": "word " * 400, "max_tokens": 4},
            )
            assert r.status == 400
            body = await r.json()
            assert "exceeds" in body["error"]["message"]

        _run(served, fn)

    def test_health_generate(self, served):
        async def fn(c):
            r = await c.get("/health_generate")
            assert r.status == 200
            assert (await r.json())["status"] == "ok"

        _run(served, fn)


class _StubStreamTts:
    """Minimal Tts with frame-chunked streaming for the endpoint test."""

    def audio_info(self):
        from crane_tpu.sdk.audio import AudioInfo

        return AudioInfo(sample_rate=24000)

    def supports_voice_cloning(self):
        return False

    def generate_speech(self, text, options=None):
        import numpy as np

        return np.zeros(480, np.float32)

    def generate_speech_stream(self, text, options=None):
        import numpy as np

        for i in range(3):
            yield np.full(240, 0.1 * (i + 1), np.float32)


def test_audio_speech_stream_endpoint(tmp_path_factory):
    """POST /v1/audio/speech with stream=true returns chunked PCM whose total
    length equals the sum of the generator's chunks (reference streaming TTS,
    qwen3_tts/modeling.rs:1497-1658); non-streaming still returns WAV."""
    import asyncio

    import jax.numpy as jnp

    from crane_tpu.models.auto import from_pretrained
    from crane_tpu.serve.api import Server, build_app
    from crane_tpu.serve.engine import InferenceEngine
    from tests.fixtures import make_tiny_qwen3_checkpoint

    d = make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("sckpt") / "m"))
    lm = from_pretrained(d, dtype=jnp.float32)
    engine = InferenceEngine(lm, max_slots=1, max_seq_len=128, decode_tokens_per_seq=1)
    engine.start()
    try:
        server = Server(engine, model_name="tiny", tts=_StubStreamTts())
        from aiohttp.test_utils import TestClient, TestServer

        async def go():
            client = TestClient(TestServer(build_app(server)))
            await client.start_server()
            try:
                resp = await client.post(
                    "/v1/audio/speech", json={"input": "hello", "stream": True}
                )
                assert resp.status == 200
                assert resp.headers["Content-Type"].startswith("audio/pcm")
                assert resp.headers["X-Sample-Rate"] == "24000"
                body = await resp.read()
                assert len(body) == 3 * 240 * 2
                resp2 = await client.post("/v1/audio/speech", json={"input": "hi"})
                assert resp2.status == 200
                return True
            finally:
                await client.close()

        assert asyncio.run(go())
    finally:
        engine.stop()


# ── TextBackend path (non-engine models: Gemma3n, reference backend.rs) ────


class _EchoModel:
    """generate_greedy stub: emits a fixed token sequence, honors eos and
    streamer (the HTTP plumbing under test; Gemma3nLM's real generate_greedy
    has the same contract and is covered by test_gemma3n.py)."""

    def __init__(self, toks):
        self.toks = toks

    def generate_greedy(self, ids, max_new_tokens, *, eos=(), streamer=None):
        out = []
        for t in self.toks[:max_new_tokens]:
            out.append(t)
            if t in eos:
                break
            if streamer is not None and streamer.append(t) is False:
                break
        if streamer is not None:
            streamer.finalize()
        return out


@pytest.fixture(scope="module")
def backend_served(tmp_path_factory):
    from crane_tpu.serve.api import Server, build_app
    from crane_tpu.serve.backend import TextBackend
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    d = make_tiny_qwen3_checkpoint(str(tmp_path_factory.mktemp("bk") / "m"))
    tok = AutoTokenizer.from_pretrained(d)
    toks = tok.encode("hello world again")
    backend = TextBackend(_EchoModel(toks), tok, eos_token_ids=(), name="echo")
    server = Server(None, model_name="tiny-backend", text_backend=backend)
    yield lambda: build_app(server)


class TestBackendServing:
    def test_backend_chat_completion(self, backend_served):
        async def fn(c):
            r = await c.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 8,
                },
            )
            assert r.status == 200
            body = await r.json()
            assert body["choices"][0]["message"]["content"].strip() != ""
            assert body["usage"]["completion_tokens"] > 0

        _run(backend_served, fn)

    def test_backend_chat_streaming(self, backend_served):
        async def fn(c):
            r = await c.post(
                "/v1/chat/completions",
                json={
                    "messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 8,
                    "stream": True,
                },
            )
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = (await r.read()).decode()
            events = [
                json.loads(line[6:])
                for line in raw.splitlines()
                if line.startswith("data: ") and line != "data: [DONE]"
            ]
            assert events[0]["choices"][0]["delta"].get("role") == "assistant"
            text = "".join(
                e["choices"][0]["delta"].get("content", "") for e in events
            )
            assert text.strip() != ""
            assert events[-1]["choices"][0]["finish_reason"] == "stop"
            assert raw.rstrip().endswith("data: [DONE]")

        _run(backend_served, fn)

    def test_engine_endpoints_rejected_without_engine(self, backend_served):
        async def fn(c):
            for path in ("/v1/stats", "/server_info"):
                r = await c.get(path)
                assert r.status == 400, path
            r = await c.post("/generate", json={"text": "hi"})
            assert r.status == 400
            r = await c.get("/health")
            assert r.status == 200

        _run(backend_served, fn)

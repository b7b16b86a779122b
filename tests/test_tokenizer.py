"""Chat-template byte-parity vs transformers + streaming detokenization.

The reference's bar: byte-identical chat-template rendering incl. tools
(/root/reference/README.md:356-361); enable_thinking UNDEFINED-vs-false
polarity (autotokenizer.rs:500-506, test mod :527-671)."""

import json

import pytest

transformers = pytest.importorskip("transformers")

from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

# A representative Qwen3-style ChatML template exercising tools, tojson,
# enable_thinking defaults, and loop controls.
QWEN_STYLE_TEMPLATE = """\
{%- if tools %}
    {{- '<|im_start|>system\\n' }}
    {%- if messages[0].role == 'system' %}
        {{- messages[0].content + '\\n\\n' }}
    {%- endif %}
    {{- "# Tools\\n\\nYou may call one or more functions.\\n\\n<tools>" }}
    {%- for tool in tools %}
        {{- "\\n" }}
        {{- tool | tojson }}
    {%- endfor %}
    {{- "\\n</tools><|im_end|>\\n" }}
{%- else %}
    {%- if messages[0].role == 'system' %}
        {{- '<|im_start|>system\\n' + messages[0].content + '<|im_end|>\\n' }}
    {%- endif %}
{%- endif %}
{%- for message in messages %}
    {%- if message.role == "user" or (message.role == "system" and not loop.first) %}
        {{- '<|im_start|>' + message.role + '\\n' + message.content + '<|im_end|>' + '\\n' }}
    {%- elif message.role == "assistant" %}
        {{- '<|im_start|>' + message.role + '\\n' + message.content + '<|im_end|>\\n' }}
    {%- endif %}
{%- endfor %}
{%- if add_generation_prompt %}
    {{- '<|im_start|>assistant\\n' }}
    {%- if enable_thinking is defined and enable_thinking is false %}
        {{- '<think>\\n\\n</think>\\n\\n' }}
    {%- endif %}
{%- endif %}"""

MESSAGES = [
    {"role": "system", "content": "You are Crane."},
    {"role": "user", "content": "What's the weather in 東京? <html> & stuff"},
    {"role": "assistant", "content": "Let me check."},
    {"role": "user", "content": "thanks"},
]

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get weather <now> & fast",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
            },
        },
    }
]


def _hf_render(messages, tools=None, **kw):
    from transformers.utils.chat_template_utils import render_jinja_template

    out, _ = render_jinja_template(
        conversations=[messages],
        chat_template=QWEN_STYLE_TEMPLATE,
        tools=tools,
        add_generation_prompt=kw.get("add_generation_prompt", True),
        **{k: v for k, v in kw.items() if k not in ("add_generation_prompt",)},
    )
    return out[0]


def _mine(messages, tools=None, **kw):
    tok = AutoTokenizer(None, chat_template=QWEN_STYLE_TEMPLATE)
    return tok.apply_chat_template(messages, tools=tools, **kw)


class TestChatTemplate:
    def test_basic_byte_identical(self):
        assert _mine(MESSAGES) == _hf_render(MESSAGES)

    def test_tools_byte_identical(self):
        """tojson must not HTML-escape and must use Python separators."""
        mine = _mine(MESSAGES, tools=TOOLS)
        ref = _hf_render(MESSAGES, tools=TOOLS)
        assert mine == ref
        assert "<now>" in mine and "&" in mine  # no HTML escaping
        assert '", "' in mine or '": "' in mine  # python separators

    def test_enable_thinking_polarity(self):
        """None -> UNDEFINED -> no <think> block; False -> empty think block."""
        none_out = _mine(MESSAGES, enable_thinking=None)
        false_out = _mine(MESSAGES, enable_thinking=False)
        true_out = _mine(MESSAGES, enable_thinking=True)
        assert "<think>" not in none_out
        assert "<think>" in false_out
        assert "<think>" not in true_out
        assert none_out == _hf_render(MESSAGES)

    def test_no_generation_prompt(self):
        out = _mine(MESSAGES, add_generation_prompt=False)
        assert not out.endswith("<|im_start|>assistant\n")

    def test_raise_exception_propagates(self):
        tok = AutoTokenizer(None, chat_template="{{ raise_exception('boom') }}")
        with pytest.raises(Exception, match="boom"):
            tok.apply_chat_template(MESSAGES)


class TestStreamingDetok:
    def _tok(self, tmp_path):
        # build a tiny byte-level BPE tokenizer so multi-byte chars split
        from tokenizers import Tokenizer, models, pre_tokenizers, decoders

        tok = Tokenizer(models.BPE())
        tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tok.decoder = decoders.ByteLevel()
        from tokenizers.trainers import BpeTrainer

        trainer = BpeTrainer(vocab_size=300, special_tokens=["<eos>"])
        tok.train_from_iterator(["hello world 東京 — ok"] * 5, trainer)
        return tok

    def test_utf8_safe_streaming(self, tmp_path):
        from crane_tpu.tokenizer.token_stream import TokenOutputStream

        tok = self._tok(tmp_path)

        class Wrap:
            def decode(self, ids, skip_special_tokens=True):
                return tok.decode(ids, skip_special_tokens=skip_special_tokens)

        text = "hello 東京 world"
        ids = tok.encode(text).ids
        stream = TokenOutputStream(Wrap())
        out = ""
        for i in ids:
            piece = stream.next_token(i)
            if piece:
                assert "�" not in piece
                out += piece
        rest = stream.decode_rest()
        if rest:
            out += rest
        assert out == text


def test_hunyuan_hardcoded_template_fallback(tmp_path):
    """A Hunyuan checkpoint with NO chat template renders through the
    hardcoded fallback (reference chat_template.rs:63-105): BOS + system +
    separator, user/assistant tags, assistant EOS after each reply, and a
    trailing assistant tag for generation."""
    import json as _json

    from tokenizers import Tokenizer, models

    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.save(str(tmp_path / "tokenizer.json"))
    (tmp_path / "tokenizer_config.json").write_text(_json.dumps({}))
    (tmp_path / "config.json").write_text(_json.dumps({"model_type": "hunyuan_v1_dense"}))
    at = AutoTokenizer.from_pretrained(str(tmp_path))
    out = at.apply_chat_template(
        [
            {"role": "system", "content": "SYS"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "yo"},
            {"role": "user", "content": "again"},
        ],
        add_generation_prompt=True,
    )
    BOS = "<｜hy_begin▁of▁sentence｜>"
    USER = "<｜hy_User｜>"
    ASSI = "<｜hy_Assistant｜>"
    EOS = "<｜hy_place▁holder▁no▁2｜>"
    SEP = "<｜hy_place▁holder▁no▁3｜>"
    assert out == f"{BOS}SYS{SEP}{USER}hi{ASSI}yo{EOS}{USER}again{ASSI}"

    # non-hunyuan checkpoints still raise (no silent wrong template)
    (tmp_path / "config.json").write_text(_json.dumps({"model_type": "qwen3"}))
    at2 = AutoTokenizer.from_pretrained(str(tmp_path))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        at2.apply_chat_template([{"role": "user", "content": "x"}])

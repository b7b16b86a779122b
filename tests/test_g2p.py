"""G2P engine tests (reference g2p/: normalization, numeral expansion,
lexicon + OOV fallback with caching)."""

import pytest

from crane_tpu.text.g2p import (
    Phonemizer,
    letter_to_sound,
    normalize_text,
    number_to_words,
    ordinal_to_words,
    year_to_words,
)


class TestNumbers:
    def test_cardinals(self):
        assert number_to_words(0) == "zero"
        assert number_to_words(13) == "thirteen"
        assert number_to_words(42) == "forty-two"
        assert number_to_words(100) == "one hundred"
        assert number_to_words(1234) == "one thousand two hundred thirty-four"
        assert number_to_words(1_000_000) == "one million"
        assert number_to_words(-7) == "minus seven"

    def test_ordinals(self):
        assert ordinal_to_words(1) == "first"
        assert ordinal_to_words(2) == "second"
        assert ordinal_to_words(3) == "third"
        assert ordinal_to_words(12) == "twelfth"
        assert ordinal_to_words(20) == "twentieth"
        assert ordinal_to_words(21) == "twenty-first"
        assert ordinal_to_words(100) == "one hundredth"

    def test_years(self):
        assert year_to_words(1984) == "nineteen eighty-four"
        assert year_to_words(1900) == "nineteen hundred"
        assert year_to_words(2024) == "twenty twenty-four"


class TestNormalize:
    def test_plain_numbers(self):
        assert normalize_text("I have 3 cats") == "I have three cats"
        assert normalize_text("about 1,234 items") == (
            "about one thousand two hundred thirty-four items"
        )

    def test_currency(self):
        assert normalize_text("it costs $5") == "it costs five dollars"
        assert normalize_text("$1") == "one dollar"
        assert (
            normalize_text("$3.50")
            == "three dollars and fifty cents"
        )

    def test_ordinal_suffix(self):
        assert normalize_text("the 3rd time") == "the third time"
        assert normalize_text("21st century") == "twenty-first century"

    def test_year(self):
        assert normalize_text("born in 1984") == "born in nineteen eighty-four"

    def test_decimal(self):
        assert normalize_text("pi is 3.14") == "pi is three point one four"

    def test_abbreviations(self):
        assert normalize_text("Dr. Smith vs. Mr. Jones") == (
            "doctor Smith versus mister Jones"
        )

    def test_whitespace_squeeze(self):
        assert normalize_text("a   b \n c") == "a b c"


class TestPhonemizer:
    def test_lexicon_first(self):
        p = Phonemizer(lexicon={"hello": "həˈloʊ", "world": "wɝld"})
        assert p.phonemize("Hello world") == "həˈloʊ wɝld"

    def test_rule_fallback_for_oov(self):
        p = Phonemizer(lexicon={})
        out = p.phonemize("ship")
        assert out == "ʃˈɪp"  # full rule engine inserts primary stress

    def test_oov_model_hook_and_cache(self):
        calls = []

        def oov(word):
            calls.append(word)
            return "X"

        p = Phonemizer(lexicon={"known": "noʊn"}, oov_fn=oov)
        p.phonemize("known mystery")
        p.phonemize("mystery known")
        assert calls == ["mystery"]  # cached on second use

    def test_normalization_feeds_phonemizer(self):
        p = Phonemizer(lexicon={"three": "θɹiː", "cats": "kæts"})
        assert p.phonemize("3 cats") == "θɹiː kæts"

    def test_lts_digraphs(self):
        # full rule engine output (english_rules.rs parity, with stress)
        assert letter_to_sound("thing") == "θˈɪŋ"
        assert letter_to_sound("check") == "tʃˈɛk"
        # closed-syllable 'a' + the -tion literal; the stress heuristic
        # ranks ə above æ (english_rules.rs VOWEL_PREFIXES priority)
        assert letter_to_sound("nation") == "nˈeɪʃən"  # -ation literal


# ── lexicon / ipa postprocess / OOV tiers (reference g2p/{lexicon,
# ipa_postprocess,oov_onnx}.rs) ──────────────────────────────────────────────


def test_lexicon_tsv_multi_pronunciation(tmp_path):
    from crane_tpu.text.lexicon import Lexicon

    p = tmp_path / "lex.tsv"
    p.write_text(
        "# comment\n"
        "read\tɹid\n"
        "read\tɹɛd\n"
        "read\tɹid\n"          # duplicate -> deduped
        "hello\thəˈloʊ\n"
    )
    lex = Lexicon.from_tsv(str(p))
    assert len(lex) == 2
    assert lex.get("hello") == "həˈloʊ"
    assert lex.get("read") == "ɹid"  # lexicographically-first alternative
    assert lex.get_all("read") == ("ɹid", "ɹɛd")
    assert lex.get("nope") is None and "nope" not in lex


def test_lexicon_rejects_malformed(tmp_path):
    import pytest as _pytest

    from crane_tpu.text.lexicon import Lexicon

    p = tmp_path / "bad.tsv"
    p.write_text("word-without-tab\n")
    with _pytest.raises(ValueError):
        Lexicon.from_tsv(str(p))


def test_ipa_normalizer_single_pass_non_cascading():
    from crane_tpu.text.ipa_postprocess import IpaNormalizer

    vocab = set("abɹiʧAðeɪ $")
    # "eɪ"->"A" must win over "e"->"ɛ" at the same start (leftmost-longest),
    # and the produced "A" must NOT be re-matched by an "A"->"a" rule
    n = IpaNormalizer([("eɪ", "A"), ("e", "i"), ("A", "a")], vocab)
    assert n.normalize("eɪ") == "A"
    assert n.normalize("e") == "i"


def test_ipa_normalizer_vocab_filter_and_whitespace():
    from crane_tpu.text.ipa_postprocess import IpaNormalizer

    n = IpaNormalizer([], set("ab "))
    assert n.normalize("  a   x b  ") == "a b"  # drop unknown, collapse ws


def test_ipa_normalizer_coercion_pool():
    from crane_tpu.text.ipa_postprocess import IpaNormalizer

    n = IpaNormalizer([], vocab=set("abc"), coerce_pool=set("ac"))
    # 'b' in vocab passes; 'd' (U+64) coerces to nearest pool char 'c' (U+63)
    assert n.normalize("bd") == "bc"


def test_seed_lexicon_tier_and_rules_fallback():
    from crane_tpu.text.g2p import Phonemizer

    p = Phonemizer()
    out = p.phonemize("hello world")
    assert out.split(" ")[0] == "həˈloʊ"  # seed lexicon hit
    # explicit lexicon overrides seed
    p2 = Phonemizer(lexicon={"hello": "XYZ"})
    assert p2.phonemize("hello").startswith("XYZ")
    # unknown word falls through to letter-to-sound
    assert p.phonemize("zorbtrag") != ""


def _tiny_oov_dir(tmp_path):
    import json as _json

    import torch
    import torch.nn as nn
    import torch.onnx._internal.torchscript_exporter.onnx_proto_utils as _opu

    _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes

    chars = {"<pad>": 0, "<unk>": 1}
    for i, c in enumerate("abcdefghijklmnopqrstuvwxyz"):
        chars[c] = i + 2
    phon = {"<pad>": 0, "<bos>": 1, "<eos>": 2}
    for i, s in enumerate(["æ", "b", "k", "ˈeɪ", "t", "ɹ"]):
        phon[s] = i + 3
    cfg = {
        "config_schema_version": 1,
        "model_kind": "oov",
        "char_vocab": chars,
        "phoneme_vocab": phon,
        "train_config": {"max_seq_len": 12},
        "oov_index": {"max_phoneme_len": 8},
    }
    d = tmp_path / "oov"
    d.mkdir()
    (d / "onnx-config.json").write_text(_json.dumps(cfg))

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(3)
            self.ce = nn.Embedding(len(chars), 16)
            self.pe = nn.Embedding(len(phon), 16)
            self.fc = nn.Linear(16, len(phon))

        def forward(self, enc_ids, enc_mask, dec_ids, dec_mask):
            c = (self.ce(enc_ids) * enc_mask[..., None]).sum(1, keepdim=True)
            h = self.pe(dec_ids) + c / enc_mask.sum(1)[:, None, None].clamp(min=1)
            return self.fc(torch.tanh(h))

    torch.onnx.export(
        M().eval(),
        (torch.zeros(1, 12, dtype=torch.long), torch.ones(1, 12, dtype=torch.long),
         torch.zeros(1, 8, dtype=torch.long), torch.ones(1, 8, dtype=torch.long)),
        str(d / "model.onnx"), opset_version=17, dynamo=False,
        input_names=["encoder_input_ids", "encoder_attention_mask",
                     "decoder_input_ids", "decoder_attention_mask"],
        output_names=["logits"],
        dynamic_axes={"encoder_input_ids": {0: "B"},
                      "encoder_attention_mask": {0: "B"},
                      "decoder_input_ids": {0: "B"},
                      "decoder_attention_mask": {0: "B"}},
    )
    return str(d)


def test_oov_model_greedy_and_beam(tmp_path):
    pytest.importorskip("torch")
    from crane_tpu.text.oov import OovModel

    m = OovModel.from_dir(_tiny_oov_dir(tmp_path))
    greedy = m.predict_phonemes("cat")
    assert isinstance(greedy, list)
    assert all(p in m.config.phoneme_to_id for p in greedy)
    beam = m.predict_phonemes_beam("cat", beam_width=3)
    assert all(p in m.config.phoneme_to_id for p in beam)
    # beam-1 equals greedy (same scoring path)
    assert m.predict_phonemes_beam("cat", beam_width=1) == greedy
    # deterministic
    assert m.predict_phonemes_beam("cat") == beam


def test_phonemizer_from_assets(tmp_path):
    pytest.importorskip("torch")
    from crane_tpu.text.g2p import Phonemizer

    lex = tmp_path / "lex.tsv"
    lex.write_text("zyxqj\tZZZ\n")
    p = Phonemizer.from_assets(
        lexicon_tsv=str(lex), oov_dir=_tiny_oov_dir(tmp_path)
    )
    assert p.phonemize("zyxqj") == "ZZZ"        # tier 1: lexicon
    assert p.phonemize("hello") == "həˈloʊ"     # tier 1b: seed
    out = p.phonemize("qqqqz")                  # tier 3: neural OOV
    assert out != "" and out != "ZZZ"

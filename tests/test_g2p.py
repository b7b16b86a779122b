"""G2P engine tests (reference g2p/: normalization, numeral expansion,
lexicon + OOV fallback with caching)."""

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
        assert out == "ʃɪp"

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
        assert letter_to_sound("thing") == "θɪŋ"
        assert letter_to_sound("check") == "tʃɛk"
        assert letter_to_sound("nation") == "næʃən"

"""German G2P engine tests, mirroring the reference's own suites
(/root/reference/crane-core/src/models/g2p/languages/german*.rs test mods):
numerals, compound decomposition, hand rules, lexicon cascade, end-to-end.
"""

import pytest

from crane_tpu.text.german import (
    IPA_PRIMARY_STRESS,
    IPA_SECONDARY_STRESS,
    GermanG2p,
    decompose,
    expand_numerals,
    german_cardinal,
    hand_rules_ipa,
    lookup_cascade,
)
from crane_tpu.text.lexicon import Lexicon


class TestNumerals:
    def test_zero(self):
        assert german_cardinal(0) == "null"

    def test_one_uses_standalone_form(self):
        assert german_cardinal(1) == "eins"

    def test_teens_including_irregulars(self):
        assert german_cardinal(16) == "sechzehn"  # not sechszehn
        assert german_cardinal(17) == "siebzehn"  # not siebenzehn
        assert german_cardinal(11) == "elf"
        assert german_cardinal(12) == "zwölf"

    def test_round_tens_including_irregular(self):
        assert german_cardinal(30) == "dreißig"
        assert german_cardinal(60) == "sechzig"
        assert german_cardinal(70) == "siebzig"

    def test_ones_before_tens_compounding(self):
        assert german_cardinal(21) == "einundzwanzig"
        assert german_cardinal(99) == "neunundneunzig"

    def test_hundreds_and_standalone_one_remainder(self):
        assert german_cardinal(100) == "einhundert"
        assert german_cardinal(101) == "einhundert eins"
        assert german_cardinal(121) == "einhundert einundzwanzig"

    def test_thousand_is_invariant(self):
        assert german_cardinal(1000) == "ein tausend"
        assert german_cardinal(2000) == "zwei tausend"

    def test_large_scales_take_gender_and_plural(self):
        assert german_cardinal(1_000_000) == "eine Million"
        assert german_cardinal(2_000_000) == "zwei Millionen"
        assert german_cardinal(1_000_000_000) == "eine Milliarde"

    def test_beyond_trillionen_reads_digits(self):
        # >= 10^21 exceeds the named scale table: digit-by-digit fallback
        # instead of an IndexError that would kill the request
        from crane_tpu.text.german import german_cardinal
        words = german_cardinal(10**22)
        assert words.startswith("eins null null")
        assert "Trillion" not in words

    def test_expand_numerals_standalone_only(self):
        assert expand_numerals("Ich habe 21 Katzen") == (
            "Ich habe einundzwanzig Katzen"
        )
        assert expand_numerals("abc123") == "abc123"  # identifier untouched
        assert expand_numerals("(42)") == "(zweiundvierzig)"
        assert expand_numerals("kein Ziffer") == "kein Ziffer"  # borrowed


class TestLookupCascade:
    def test_exact_case_hit(self):
        lex = Lexicon.from_tsv_text("Haus\thaʊ̯s\n")
        assert lookup_cascade(lex, "Haus") == "haʊ̯s"

    def test_title_case_hit(self):
        lex = Lexicon.from_tsv_text("Haus\thaʊ̯s\n")
        assert lookup_cascade(lex, "haus") == "haʊ̯s"

    def test_lowercase_hit(self):
        lex = Lexicon.from_tsv_text("laufen\tˈlaʊ̯fn̩\n")
        assert lookup_cascade(lex, "Laufen") == "ˈlaʊ̯fn̩"

    def test_miss_returns_none(self):
        lex = Lexicon.from_tsv_text("Haus\thaʊ̯s\n")
        assert lookup_cascade(lex, "Fenster") is None


class TestCompound:
    def test_two_component_split_with_case_cascade(self):
        lex = Lexicon.from_tsv_text("Hand\thant\nSchuhfach\tʃuːfax\n")
        assert decompose(lex, "Handschuhfach") == "hantʃuːfax"

    def test_three_component_split(self):
        lex = Lexicon.from_tsv_text("auto\taʊto\nbahn\tban\nschule\tʃuːlə\n")
        assert decompose(lex, "autobahnschule") == "aʊtobanʃuːlə"

    def test_backtracks_from_dead_end_longest_match(self):
        lex = Lexicon.from_tsv_text(
            "handschuh\thantʃuː\nhand\thant\nschuhfach\tʃuːfax\n"
        )
        assert decompose(lex, "handschuhfach") == "hantʃuːfax"

    def test_no_valid_split_returns_none(self):
        lex = Lexicon.from_tsv_text("Haus\thaʊ̯s\n")
        assert decompose(lex, "donaudampfschiff") is None

    def test_word_under_min_compound_len_never_split(self):
        lex = Lexicon.from_tsv_text("auto\taʊto\nbahn\tban\n")
        assert decompose(lex, "autobahn") is None  # 8 chars <= 12

    def test_word_over_max_compound_len_never_split(self):
        lex = Lexicon.from_tsv_text("auto\taʊto\n")
        assert decompose(lex, "auto" * 11) is None  # 44 > 40

    def test_compound_stress_downgrades_non_first_components(self):
        lex = Lexicon.from_tsv_text("donau\tˈdoːnaʊ̯\nkapitäne\tkapiˈtɛːnə\n")
        ipa = decompose(lex, "donaukapitäne")
        assert ipa.count(IPA_PRIMARY_STRESS) == 1
        assert IPA_SECONDARY_STRESS in ipa
        assert ipa.startswith("ˈdoːnaʊ̯")


class TestHandRules:
    def test_empty_and_punctuation_only(self):
        assert hand_rules_ipa("") == ""
        assert hand_rules_ipa("---") == ""

    def test_non_german_characters_dropped_and_case_folded(self):
        assert hand_rules_ipa("h3llo") == hand_rules_ipa("hllo")
        assert hand_rules_ipa("HAUS") == hand_rules_ipa("haus")

    def test_context_graphemes(self):
        assert "tʃ" in hand_rules_ipa("deutsch")
        assert "ʃ" in hand_rules_ipa("schule")
        assert "ks" in hand_rules_ipa("wachsen")
        assert "ŋ" in hand_rules_ipa("lang")
        bank = hand_rules_ipa("bank")
        assert "ŋ" in bank and "k" in bank
        assert "pf" in hand_rules_ipa("pferd")
        # qu -> kv, then per-syllable final devoicing turns it into kf
        assert "kf" in hand_rules_ipa("quelle")

    def test_ich_ach_laut_split(self):
        assert "x" in hand_rules_ipa("buch")      # back vowel
        assert "ç" in hand_rules_ipa("ich")       # front vowel
        assert "x" in hand_rules_ipa("brauchen")  # after au diphthong
        assert "ç" in hand_rules_ipa("chef")      # word-initial
        durch = hand_rules_ipa("durch")           # intervening consonant
        assert "ç" in durch and "x" not in durch

    def test_st_sp_palatalization_at_morpheme_starts_only(self):
        assert "ʃt" in hand_rules_ipa("stahl")
        assert "ʃp" in hand_rules_ipa("spiel")
        fenster = hand_rules_ipa("fenster")
        assert "st" in fenster and "ʃt" not in fenster
        assert "ʃt" in hand_rules_ipa("auto-stopp")  # hyphen boundary

    def test_h_morpheme_initial_only(self):
        assert "h" in hand_rules_ipa("haus")
        assert "h" in hand_rules_ipa("auto-haus")
        assert "h" not in hand_rules_ipa("sehen")  # silent between vowels

    def test_fixed_consonants(self):
        s = hand_rules_ipa("straße")
        assert "s" in s and "ß" not in s
        assert "ts" in hand_rules_ipa("katze")
        assert "ts" in hand_rules_ipa("zeit")
        zucker = hand_rules_ipa("zucker")
        assert "k" in zucker and "kk" not in zucker
        assert "ts" in hand_rules_ipa("celsius")
        assert "f" in hand_rules_ipa("vater")
        assert "v" in hand_rules_ipa("wasser")
        assert "ks" in hand_rules_ipa("axt")
        assert "ʏ" in hand_rules_ipa("system")

    def test_diphthongs(self):
        assert "aʊ̯" in hand_rules_ipa("haus")
        assert "aɪ̯" in hand_rules_ipa("mein")
        assert "ɔʏ̯" in hand_rules_ipa("heute")
        assert "ɔʏ̯" in hand_rules_ipa("konvoi")

    def test_vowel_length(self):
        assert "iː" in hand_rules_ipa("liebe")
        assert "aː" in hand_rules_ipa("haar")
        assert "oː" in hand_rules_ipa("boot")
        # open syllable lengthens: Na-me
        assert "aː" in hand_rules_ipa("name")
        # doubled consonant keeps the vowel short
        kommen = hand_rules_ipa("kommen")
        assert "oː" not in kommen and "ɔ" in kommen
        # Dehnungs-h lengthens even with a coda, and stays silent
        ruhm = hand_rules_ipa("ruhm")
        assert "uː" in ruhm and "h" not in ruhm
        # lengthening does not cross a hyphen boundary
        assert "toː" in hand_rules_ipa("auto-stopp")

    def test_schwa_and_er_vocalization(self):
        assert hand_rules_ipa("liebe").endswith("ə")
        laden = hand_rules_ipa("laden")
        assert "ə" in laden and "ɛ" not in laden
        assert "ə" in hand_rules_ipa("vogel")
        assert hand_rules_ipa("fenster").endswith("ɐ")

    def test_umlauts(self):
        assert "ɛ" in hand_rules_ipa("mächtig")
        assert "ø" in hand_rules_ipa("können")
        assert "ʏ" in hand_rules_ipa("müll")

    def test_r_and_s_voicing(self):
        from crane_tpu.text.german import _syllable_to_ipa

        assert "ʁ" in hand_rules_ipa("rot")
        assert "ss" not in hand_rules_ipa("wasser")
        # intervocalic voicing looks within the syllable; the syllabifier
        # gives a lone consonant to the next syllable's onset, so (like the
        # reference's own test, german_rules.rs:997-1008) exercise the rule
        # against a hand-built syllable
        assert "z" in _syllable_to_ipa("asa", "asa", [True, False, False], 0)
        haus = hand_rules_ipa("haus")
        assert "s" in haus and "z" not in haus

    def test_ig_softening(self):
        assert hand_rules_ipa("mächtig").endswith("ç")
        # diphthong -ig is not the suffix
        zweig = hand_rules_ipa("zweig")
        assert zweig.endswith("k") and not zweig.endswith("ç")

    def test_final_devoicing(self):
        assert hand_rules_ipa("lieb").endswith("p")
        assert hand_rules_ipa("rad").endswith("t")
        assert hand_rules_ipa("tag").endswith("k")

    def test_stress_placement(self):
        assert IPA_PRIMARY_STRESS in hand_rules_ipa("haus")
        # stress precedes the whole onset cluster
        assert hand_rules_ipa("klettern").startswith(IPA_PRIMARY_STRESS)
        # -ung pulls stress to the final syllable
        zeitung = hand_rules_ipa("zeitung")
        assert not zeitung.startswith(IPA_PRIMARY_STRESS)
        assert IPA_PRIMARY_STRESS in zeitung
        # unstressed prefix shifts stress off the first syllable
        besuch = hand_rules_ipa("besuchen")
        assert not besuch.startswith(IPA_PRIMARY_STRESS)
        assert IPA_PRIMARY_STRESS in besuch
        # exactly one stress mark
        assert hand_rules_ipa("fenster").count(IPA_PRIMARY_STRESS) == 1


class TestEngine:
    def test_malformed_lexicon_raises(self):
        with pytest.raises(ValueError):
            GermanG2p("no-tab-here\n")

    def test_single_word_hit(self):
        eng = GermanG2p("Haus\thaʊ̯s\n")
        assert eng.text_to_ipa("Haus") == "haʊ̯s"

    def test_multi_word_joins_with_spaces(self):
        eng = GermanG2p("Haus\thaʊ̯s\nFenster\tˈfɛnstɐ\n")
        assert eng.text_to_ipa("Haus Fenster") == "haʊ̯s ˈfɛnstɐ"

    def test_punctuation_trimmed_case_preserved(self):
        eng = GermanG2p("Haus\thaʊ̯s\n")
        assert eng.text_to_ipa('"Haus!"') == "haʊ̯s"

    def test_three_tier_fallthrough(self):
        eng = GermanG2p("Hand\thant\nSchuhfach\tʃuːfax\n")
        # tier 1: lexicon; tier 2: compound; tier 3: rules
        out = eng.text_to_ipa("Hand Handschuhfach blumen")
        parts = out.split(" ")
        assert parts[0] == "hant"
        assert parts[1] == "hantʃuːfax"
        assert parts[2] == hand_rules_ipa("blumen")

    def test_numerals_expand_before_lookup(self):
        eng = GermanG2p("einundzwanzig\tˈaɪ̯nʊntˌtsvantsɪç\n")
        assert eng.text_to_ipa("21") == "ˈaɪ̯nʊntˌtsvantsɪç"

    def test_unresolvable_words_skipped(self):
        eng = GermanG2p("Haus\thaʊ̯s\n")
        assert eng.text_to_ipa("Haus ... Haus") == "haʊ̯s haʊ̯s"


class TestMultilingualRouting:
    def test_language_routes_to_engines(self):
        from crane_tpu.text.g2p import MultilingualPhonemizer

        mp = MultilingualPhonemizer()
        de = mp.text_to_ipa("Müll straße", "de")
        assert "ʏ" in de and "ʃ" in de  # German rules fired
        en = mp.text_to_ipa("hello", "en_us")
        assert en  # English engine fired
        assert mp.text_to_ipa("zeit", "de") != mp.text_to_ipa("zeit", "en_us")


def test_kokoro_synthesis_from_german_text():
    """German text -> IPA -> Kokoro pipeline (VERDICT r2 #3's done bar):
    the multilingual phonemizer plugs into KokoroTts' text_to_ipa protocol
    and the de normalizer keeps the German IPA codepoints."""
    import numpy as np

    from crane_tpu.models.kokoro_tts import (
        STYLE_DIM,
        KokoroNetConfig,
        KokoroSynthesizer,
        KokoroTts,
    )
    from crane_tpu.text.g2p import MultilingualPhonemizer

    phonemes = "abdefhijklmnopstuvzçøʁʃʏɐɔəɛɪʊŋː̯ˈˌxa"
    vocab = {"$": 0}
    for i, c in enumerate(sorted(set(phonemes))):
        vocab[c] = i + 1
    cfg = KokoroNetConfig(vocab_size=len(vocab) + 4, dim=16, hop=40, max_duration=6)
    voices = {"de_voice": np.random.default_rng(0).standard_normal(
        (510, STYLE_DIM)).astype(np.float32)}
    tts = KokoroTts(vocab, voices, KokoroSynthesizer(cfg, seed=0),
                    phonemizer=MultilingualPhonemizer())
    wav, sr = tts.generate_speech(
        "Haus und Garten 21", language="de", voice="de_voice"
    )
    assert wav.size > 0 and np.isfinite(wav).all()

"""English hand LTS rules, mirroring the reference's suite
(/root/reference/crane-core/src/models/g2p/languages/english_rules.rs tests):
function words, affix decomposition, silent letters, ough/gh/th context,
magic-e, r-colored vowels, soft c/g, stress insertion."""

from crane_tpu.text.english_rules import (
    _strip_prefix,
    _strip_suffix,
    add_primary_stress_if_missing,
    hand_oov_rules_ipa,
)


class TestFunctionWords:
    def test_reduced_forms_with_stress(self):
        assert hand_oov_rules_ipa("the") == "ðˈə"
        assert hand_oov_rules_ipa("a") == "ˈə"
        assert hand_oov_rules_ipa("they") == "ðˈeɪ"

    def test_th_voicing(self):
        assert "ð" in hand_oov_rules_ipa("the")
        assert "θ" in hand_oov_rules_ipa("think")
        assert "ð" not in hand_oov_rules_ipa("think")
        for w in ("though", "with", "thus", "those"):
            assert "ð" in hand_oov_rules_ipa(w), w


class TestAffixes:
    def test_suffixes_stripped_and_appended(self):
        assert hand_oov_rules_ipa("darkness").endswith("nəs")
        assert hand_oov_rules_ipa("quickly").endswith("li")
        assert hand_oov_rules_ipa("workable").endswith("əbəl")
        assert hand_oov_rules_ipa("payment").endswith("mənt")
        assert hand_oov_rules_ipa("joyful").endswith("fəl")
        assert hand_oov_rules_ipa("famous").endswith("əs")
        assert hand_oov_rules_ipa("horrible").endswith("əbəl")
        assert hand_oov_rules_ipa("harmless").endswith("ləs")

    def test_double_suffix_recursion(self):
        assert hand_oov_rules_ipa("hopelessly").endswith("ləsli")

    def test_vowelless_stem_rejected(self):
        # "thrive" must NOT split into thr + -ive: magic-e needs the full word
        assert _strip_suffix("thrive") is None
        assert _strip_suffix("strive") is None
        assert hand_oov_rules_ipa("thrive") == "θɹˈaɪv"
        assert "aɪ" in hand_oov_rules_ipa("strive")
        assert _strip_suffix("executive") == ("execut", "ɪv")

    def test_prefixes_stripped_and_prepended(self):
        assert hand_oov_rules_ipa("unhappy").startswith("ʌn")
        assert hand_oov_rules_ipa("dislike").startswith("dɪs")

    def test_prefix_not_stripped_before_vowel_stem(self):
        assert _strip_prefix("union") is None
        assert _strip_prefix("unit") is None

    def test_double_prefix_recursion(self):
        assert hand_oov_rules_ipa("undisputed").startswith("ʌndɪs")

    def test_prefix_enables_silent_kn(self):
        ipa = hand_oov_rules_ipa("unknown")
        assert ipa.startswith("ʌn")
        assert "k" not in ipa

    def test_prefix_and_suffix_both_strip(self):
        ipa = hand_oov_rules_ipa("unworkable")
        assert ipa.startswith("ʌn") and ipa.endswith("əbəl")


class TestSilentLetters:
    def test_initial_clusters(self):
        assert "k" not in hand_oov_rules_ipa("know")
        assert "w" not in hand_oov_rules_ipa("write")
        assert "ɹ" in hand_oov_rules_ipa("write")
        assert "ɡ" not in hand_oov_rules_ipa("gnat")
        assert "p" not in hand_oov_rules_ipa("psalm")

    def test_final_mb(self):
        assert hand_oov_rules_ipa("lamb") == "lˈæm"
        for w in ("lambs", "climbing", "combed"):
            ipa = hand_oov_rules_ipa(w)
            assert "b" not in ipa, (w, ipa)
            assert "m" in ipa
        for w in ("timber", "combat"):
            assert "b" in hand_oov_rules_ipa(w), w

    def test_kn_mid_word_sounds_both(self):
        ipa = hand_oov_rules_ipa("acknowledge")
        assert "k" in ipa and "n" in ipa


class TestContextGraphemes:
    def test_gh(self):
        night = hand_oov_rules_ipa("night")
        assert "aɪ" in night and "ɡ" not in night
        assert "ɡ" in hand_oov_rules_ipa("ghost")

    def test_ough(self):
        t = hand_oov_rules_ipa("thought")
        assert "ɔːt" in t and "oʊt" not in t
        d = hand_oov_rules_ipa("dough")
        assert "oʊ" in d and "ɔːt" not in d
        dr = hand_oov_rules_ipa("drought")
        assert "aʊt" in dr and "ɔːt" not in dr

    def test_digraphs(self):
        assert "ʃ" in hand_oov_rules_ipa("ship")
        assert "tʃ" in hand_oov_rules_ipa("chip")
        assert "f" in hand_oov_rules_ipa("phone")
        assert "ŋ" in hand_oov_rules_ipa("song")


class TestVowels:
    def test_magic_e(self):
        assert "eɪ" in hand_oov_rules_ipa("make")
        assert "aɪ" in hand_oov_rules_ipa("type")
        assert "aɪ" in hand_oov_rules_ipa("style")

    def test_r_controlled(self):
        assert "ɑɹ" in hand_oov_rules_ipa("car")
        # final unstressed/NURSE -er is the schwar, not the DRESS vowel
        assert "ɚ" in hand_oov_rules_ipa("her")
        assert "ɚ" in hand_oov_rules_ipa("teacher")

    def test_pronounced_final_e_is_fleece(self):
        # a word-final e that survives the silent-e rule (it's the only
        # vowel) is FLEECE: he/be/she = hi/bi/ʃi in the lexicon
        for w in ("he", "be", "she"):
            ipa = hand_oov_rules_ipa(w)
            assert "iː" in ipa, (w, ipa)

    def test_soft_hard_c_g(self):
        assert "s" in hand_oov_rules_ipa("cell")
        assert "s" not in hand_oov_rules_ipa("cat")
        assert "dʒ" in hand_oov_rules_ipa("gem")
        assert "ɡ" in hand_oov_rules_ipa("gap")


class TestMisc:
    def test_doubled_consonants_collapse(self):
        m = hand_oov_rules_ipa("miss")
        assert "ss" not in m and "s" in m

    def test_stress_always_present(self):
        assert "ˈ" in hand_oov_rules_ipa("xyzzy")

    def test_stress_not_duplicated(self):
        assert add_primary_stress_if_missing("ˈæb") == "ˈæb"
        assert add_primary_stress_if_missing("ˌæb") == "ˌæb"

    def test_empty_and_punct(self):
        assert hand_oov_rules_ipa("") == ""
        assert hand_oov_rules_ipa("---") == ""

    def test_non_ascii_and_digits_dropped(self):
        assert hand_oov_rules_ipa("café") == "kˈæf"
        assert hand_oov_rules_ipa("3d") == "ˈd"

    def test_compound_digraph_boundary_known_limitation(self):
        # documented limitation: gh spans the compound boundary
        assert hand_oov_rules_ipa("doghouse") == "dɒˈaʊs"


def test_secondary_stress_on_long_derivations():
    """Long -ation derivations carry initial secondary stress like the
    reference (english_rules.rs secondary-stress placement); short words
    never do."""
    assert hand_oov_rules_ipa("information").startswith("ˌ")
    assert "ˈeɪʃən" in hand_oov_rules_ipa("information")
    assert "ˌ" not in hand_oov_rules_ipa("cat")
    assert "ˌ" not in hand_oov_rules_ipa("about")

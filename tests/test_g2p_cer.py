"""Lexicon-holdout CER regression bound for the English LTS rules.

The reference selected its rules by CER measurement (english_rules.rs —
"re/mis/pre measured CER-negative and excluded"); crane_tpu/text/cer.py is
the equivalent harness. History on the 567-word seed-lexicon holdout
(stress-stripped, convention-canonicalized):

  round 3 rules:                         0.2411
  + r-guard + final-y                    0.2253
  + y-glide/who/ew-coronal/cial/ther     0.2062
  + a-schwa/-nge/final-s-voicing         0.1972
  + ould/ore/ook + o-contexts            0.1856
  + final-er schwar + initial-u glide    0.1773
  + -ation literal + secondary stress     0.1771
  + STRUT/GOOSE/FLEECE in _VOWEL_IPA     0.1717
  + ose/alk/eir/all/uy + th contractions 0.1638
  + pronounced-final-e FLEECE            0.1563
  + final -le/-en reduction              0.1508
  + aCe guard / who=hu / through=GOOSE   0.1445
  + u,i vowel-sound + theres             0.1435

A rules change that regresses the bound must come with a measured
justification (update the constant AND this table).
"""

from crane_tpu.text.cer import cer, edit_distance, lts_cer

CER_BOUND = 0.15  # current measured 0.1435 + slack for lexicon tweaks


def test_edit_distance_basics():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("abc", "axc") == 1
    assert edit_distance("abc", "") == 3
    assert cer("ab", "abcd") == 0.5


def test_lts_cer_below_bound():
    mean, rows = lts_cer()
    assert len(rows) > 500  # the holdout actually covers the lexicon
    assert mean <= CER_BOUND, (
        f"LTS CER regressed: {mean:.4f} > {CER_BOUND} "
        f"(worst: {rows[:5]})"
    )


def test_function_words_excluded_from_holdout():
    """Scoring the rules' own exception table would measure lookup, not
    generalization — the harness must exclude it."""
    from crane_tpu.text.english_rules import FUNCTION_WORDS

    _, rows = lts_cer()
    words = {r[0] for r in rows}
    assert not (words & set(FUNCTION_WORDS))

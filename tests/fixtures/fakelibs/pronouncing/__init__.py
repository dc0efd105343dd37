"""Fixture double for the `pronouncing` CMU wrapper: every word is "in
the dictionary" with a distinctive 2-syllable pronunciation, except
words containing 'q' (→ IndexError path, mirroring OOV words the
reference omits from the syllable tally)."""

FAKE_SYLLABLES = 2


def phones_for_word(word):
    if "q" in word.lower():
        return []
    return [f"F EY1 K {word}"]


def syllable_count(phones):
    return FAKE_SYLLABLES

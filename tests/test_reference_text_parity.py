"""Text-pipeline parity against the reference's ACTUAL text modules —
all six of them, executed.

`datestime.py` and `cmudict.py` are dependency-free and `acronyms.py`
only needs its sibling cmudict, so those execute directly.
`numbers.py` (inflect) and `cleaners.py` (unidecode) import packages
the container lacks — but only as leaf functions, so sys.modules shims
built from our first-party stand-ins let the reference's own regexes,
handler branches, and pipeline order run (see the shim section below),
which also unlocks the whole `text/__init__.py` package
(text_to_sequence / get_arpabet / sequence_to_text). Everything is
compared on the vendored byte-identical `data/` assets.

acronyms.py builds its CMUDict from the cwd-relative path
'data/cmudict_dictionary' at import time (reference:text/acronyms.py:36);
the fixture loads it with cwd at the repo root, whose data/ assets are
byte-identical to the reference's.
"""

import importlib.util
import os
import sys
import types

import pytest

REF_TEXT = "/root/reference/text"
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEXT),
    reason="reference checkout not available")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_datestime():
    return _load("reftext_datestime",
                 os.path.join(REF_TEXT, "datestime.py"))


@pytest.fixture(scope="module")
def ref_cmudict():
    return _load("reftext.cmudict", os.path.join(REF_TEXT, "cmudict.py"))


@pytest.fixture(scope="module")
def ref_acronyms(ref_cmudict):
    # acronyms.py does `from .cmudict import CMUDict`: synthesize the
    # package, and chdir so its import-time CMUDict('data/...') load
    # resolves against the repo's vendored (byte-identical) dictionary.
    pkg = types.ModuleType("reftext")
    pkg.__path__ = [REF_TEXT]
    sys.modules["reftext"] = pkg
    pkg.cmudict = ref_cmudict
    cwd = os.getcwd()
    os.chdir(REPO_ROOT)
    try:
        return _load("reftext.acronyms",
                     os.path.join(REF_TEXT, "acronyms.py"))
    finally:
        os.chdir(cwd)


DATETIME_CASES = [
    "meet me at 10:30am tomorrow",
    "meet me at 10:30 am tomorrow",
    "it starts at 7pm sharp",
    "it starts at 7 pm sharp",
    "12:00 pm is noon",
    "the train leaves at 23:15 tonight",
    "9am or 9:00am, either works",
    "between 1:05pm and 2:45 pm",
    "code 12:34 is not a time of day necessarily",
    "10:30 AM uppercase meridiem",          # ref DROPS the AM here
    "10:30 Am mixed-case meridiem",
    "10:30 aM mixed-case meridiem",
    "half past: 0:30",
    "no minutes 14: colon dangling",
    "scores were 3:2 and 21:09",
    "at 00:00 exactly",
]


class TestReferenceDatestimeParity:
    @pytest.mark.parametrize("text", DATETIME_CASES)
    def test_normalize(self, ref_datestime, text):
        from flowtron_tpu.text.datestime import normalize_datestime
        assert normalize_datestime(text) == \
            ref_datestime.normalize_datestime(text)


CMUDICT_PATH = os.path.join(REPO_ROOT, "data", "cmudict_dictionary")

WORDS = [
    "hello", "WORLD", "read", "Read", "live", "the", "a", "an",
    "tomato", "ASSOCIATE", "associate's", "can't", "o'clock",
    "nonexistentword", "nasa", "dvd", "usa", "qzx",
]


class TestReferenceCMUDictParity:
    @pytest.mark.parametrize("keep_ambiguous", [True, False])
    def test_entries_and_lookup(self, ref_cmudict, keep_ambiguous):
        from flowtron_tpu.text.cmudict import CMUDict
        ref = ref_cmudict.CMUDict(CMUDICT_PATH,
                                  keep_ambiguous=keep_ambiguous)
        ours = CMUDict(CMUDICT_PATH, keep_ambiguous=keep_ambiguous)
        assert len(ours) == len(ref)
        for w in WORDS:
            assert ours.lookup(w) == ref.lookup(w), w

    def test_full_table_equal(self, ref_cmudict):
        """Every parsed entry identical, not just a sample."""
        from flowtron_tpu.text.cmudict import CMUDict
        ref = ref_cmudict.CMUDict(CMUDICT_PATH)
        ours = CMUDict(CMUDICT_PATH)
        assert ours._entries == ref._entries


ACRONYM_CASES = [
    "NASA launched a rocket",
    "the FBI and the CIA",
    "I bought three DVDs yesterday",
    "U.S.A. spelled with dots",
    "the HTML and CSS files",
    "plain words stay as they are",
    "chapter VII of the book",           # ref does NOT ignore romans
    "IDs and IOUs",
    "MAC addresses and MACs",
    "A single letter is not an acronym",
    "NATO summit at the UN",
]


class TestReferenceAcronymsParity:
    @pytest.mark.parametrize("text", ACRONYM_CASES)
    def test_normalize(self, ref_acronyms, text):
        from flowtron_tpu.text.acronyms import normalize_acronyms
        from flowtron_tpu.text.cmudict import CMUDict
        cmu = CMUDict(CMUDICT_PATH, keep_ambiguous=False)
        assert normalize_acronyms(text, cmu) == \
            ref_acronyms.normalize_acronyms(text), text


# ---------------------------------------------------------------------------
# Executing the reference's numbers.py / cleaners.py / text/__init__.py.
#
# These modules import inflect and unidecode, which the container lacks —
# but only as leaf FUNCTIONS. Installing sys.modules shims whose
# number_to_words / unidecode are our own first-party stand-ins
# (text/numwords.py, cleaners.convert_to_ascii) lets the reference's OWN
# regexes, handler branches, and pipeline order execute
# (reference:text/numbers.py:60-100, text/cleaners.py:99-131,
# text/__init__.py:17-107). With the leaf functions held equal on both
# sides, any output difference is a divergence in the logic we rebuilt —
# exactly the check that caught the datestime meridiem quirk in round 4.
# ---------------------------------------------------------------------------

def _dep_shims():
    import flowtron_tpu.text.numwords as nw
    from flowtron_tpu.text.cleaners import convert_to_ascii

    inflect_mod = types.ModuleType("inflect")

    class _Engine:
        @staticmethod
        def number_to_words(num, andword="and", zero="zero", group=0,
                            **kwargs):
            return nw.number_to_words(num, andword=andword, zero=zero,
                                      group=group)

    inflect_mod.engine = _Engine
    unidecode_mod = types.ModuleType("unidecode")
    unidecode_mod.unidecode = convert_to_ascii
    return {"inflect": inflect_mod, "unidecode": unidecode_mod}


@pytest.fixture(scope="module")
def ref_text(request):
    """The reference's `text` package, executed whole under dep shims.

    Loaded as top-level package `text` so its absolute self-imports
    (`from text import cleaners`) resolve to the reference's own
    modules; cwd is the repo root so its import-time loads of
    data/cmudict_dictionary and data/heteronyms hit our byte-identical
    vendored assets."""
    names = ["inflect", "unidecode", "text", "text.cleaners",
             "text.symbols", "text.numbers", "text.acronyms",
             "text.datestime", "text.cmudict"]
    saved = {n: sys.modules.get(n) for n in names}
    sys.modules.update(_dep_shims())
    cwd = os.getcwd()
    os.chdir(REPO_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            "text", os.path.join(REF_TEXT, "__init__.py"),
            submodule_search_locations=[REF_TEXT])
        mod = importlib.util.module_from_spec(spec)
        sys.modules["text"] = mod
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)

    def _restore():
        for n in names:
            if saved[n] is None:
                sys.modules.pop(n, None)
            else:
                sys.modules[n] = saved[n]

    request.addfinalizer(_restore)
    return mod


NUMBERS_CASES = [
    "I have $4 million in the bank",
    "he paid $2 billion dollars for it",
    "it costs $1.50 and £20 elsewhere",
    "a $1,000,000 jackpot",
    "exactly $1 and later $0.99 and $1.01",
    "$.50 worth of gum",
    "1,234,567 people attended",
    "pi is 3.14159 roughly",
    "the 1st, 2nd, 3rd, 4th and 21st of May",
    "the 100th anniversary",
    "music of the 1950's and the 1970's",
    "born in 2000, graduated 2005, retired 2019",
    "the year 1999 and the year 1800",
    "1001 nights and 2345 problems",
    "it was 100 F outside, a 30.5c reading, 3 K",
    "a 10k run and engine 12d",
    "7 plus 8 equals 15",
    "0 degrees at midnight",
    "room 101",
    "£5 then £1,200",
    "version 2.0.1 is out",            # multi-dot: "unexpected format"
    "$12.34.56 is malformed",
    "19's odd possessive",
]


class TestReferenceNumbersParity:
    """Our normalize_numbers vs the reference's, EXECUTED, with the
    inflect leaf held equal on both sides."""

    @pytest.mark.parametrize("text", NUMBERS_CASES)
    def test_goldens(self, ref_text, text):
        from flowtron_tpu.text.numbers import normalize_numbers
        ref_numbers = sys.modules["text.numbers"]
        assert normalize_numbers(text) == \
            ref_numbers.normalize_numbers(text), text

    def test_fuzz_integers_and_forms(self, ref_text):
        import random
        from flowtron_tpu.text.numbers import normalize_numbers
        ref_numbers = sys.modules["text.numbers"]
        rng = random.Random(0xF10)
        forms = [
            lambda n: str(n),
            lambda n: f"{n:,}",
            lambda n: f"${n}",
            lambda n: f"${n}.{rng.randrange(100):02d}",
            lambda n: f"£{n}",
            lambda n: f"{n}{['st','nd','rd','th'][rng.randrange(4)]}",
            lambda n: f"{n}'s",
            lambda n: f"{n}.{rng.randrange(1000)}",
            lambda n: f"{n} {'fck'[rng.randrange(3)]}",
            lambda n: f"${n} {'million' if rng.random() < 0.5 else 'thousand'}",
        ]
        for i in range(300):
            n = rng.choice([rng.randrange(10), rng.randrange(100),
                            rng.randrange(10000),
                            rng.randrange(1000, 3000),
                            rng.randrange(10 ** 9)])
            text = f"about {rng.choice(forms)(n)} total"
            assert normalize_numbers(text) == \
                ref_numbers.normalize_numbers(text), text


CLEANERS_CASES = [
    "Dr. Smith lives at No. 10 on 5th Avenue since 1999",
    "state-of-the-art TTS in the 1990's",
    "meet me at 10:30am on May 3rd, it's $5.50",
    "NASA's DVDs cost $4 million",
    "multi   spaces\tand\nnewlines   everywhere",
    "well-known co-operative ventures",
    "No. 7 was DR. WHO'S favorite",
    "the FBI, the CIA, and NATO met at 9:15 pm",
    "a £100 fine and a $1,000 reward on the 2nd",
    "plain text passes through unchanged",
]

ASCII_CASES = [
    "café naïve São Paulo",
    "Zürich über alles — dash",
    "Œuvre and ß sharp s",
]


class TestReferenceCleanersParity:
    """Full cleaner pipelines vs the reference's, EXECUTED, with
    unidecode/inflect leaves held equal on both sides."""

    def _ours(self):
        from flowtron_tpu.text import cleaners as cl
        from flowtron_tpu.text.cmudict import CMUDict
        cl.set_acronym_cmudict(CMUDict(CMUDICT_PATH,
                                       keep_ambiguous=False))
        return cl

    @pytest.mark.parametrize("text", CLEANERS_CASES)
    def test_flowtron_cleaners(self, ref_text, text):
        cl = self._ours()
        assert cl.flowtron_cleaners(text) == \
            ref_text.cleaners.flowtron_cleaners(text), text

    @pytest.mark.parametrize("text", CLEANERS_CASES + ASCII_CASES)
    def test_english_cleaners(self, ref_text, text):
        cl = self._ours()
        assert cl.english_cleaners(text) == \
            ref_text.cleaners.english_cleaners(text), text

    @pytest.mark.parametrize("text", ASCII_CASES)
    def test_basic_and_transliteration(self, ref_text, text):
        cl = self._ours()
        assert cl.basic_cleaners(text) == \
            ref_text.cleaners.basic_cleaners(text)
        assert cl.transliteration_cleaners(text) == \
            ref_text.cleaners.transliteration_cleaners(text)

    def test_helper_functions(self, ref_text):
        cl = self._ours()
        rc = ref_text.cleaners
        for t in ["ABC123def", "x-ray y-axis", "a  b", "Lt. Col. Mr. X"]:
            assert cl.separate_acronyms(t) == rc.separate_acronyms(t)
            assert cl.remove_hyphens(t) == rc.remove_hyphens(t)
            assert cl.expand_abbreviations(t) == rc.expand_abbreviations(t)


T2S_CASES = [
    "Turn left on {HH AW1 S S T AH0 N} Street.",
    "{P R IY1 F IH0 K S} at the start",
    "at the end {S AH1 F IH0 K S}",
    "two {W ER1 D Z} in {AH0} row",
    "plain ascii text with punctuation, and 'quotes'!",
    "drops unknown symbols: ü é — kept: a-z A-Z 0-9",
    "tilde~and_underscore are dropped",
    "{AY1} lone arpabet",
    "",
]


class TestReferenceTextToSequenceParity:
    """text_to_sequence / sequence_to_text / get_arpabet vs the
    reference's, EXECUTED (reference:text/__init__.py:17-107)."""

    @pytest.mark.parametrize("text", T2S_CASES)
    def test_text_to_sequence(self, ref_text, text):
        from flowtron_tpu.text import text_to_sequence
        assert text_to_sequence(text) == ref_text.text_to_sequence(text)

    @pytest.mark.parametrize("text", T2S_CASES)
    def test_sequence_to_text_roundtrip(self, ref_text, text):
        from flowtron_tpu.text import sequence_to_text, text_to_sequence
        ids = text_to_sequence(text)
        assert sequence_to_text(ids) == ref_text.sequence_to_text(ids)

    def test_get_arpabet(self, ref_text):
        from flowtron_tpu.text import get_arpabet, set_heteronyms_path
        from flowtron_tpu.text.cmudict import CMUDict
        set_heteronyms_path(os.path.join(REPO_ROOT, "data", "heteronyms"))
        ours_cmu = CMUDict(CMUDICT_PATH, keep_ambiguous=False)
        ref_cmu = ref_text.cmudict.CMUDict(CMUDICT_PATH,
                                           keep_ambiguous=False)
        words = [
            "house", "House", "HOUSE", "houses", "cat's", "cats'",
            "it's", "It's", "James's", "'quoted'", '"double!"',
            "(parens)", "end.", "...lead", "read", "live", "associate",
            "qzxv", "don't", "o'clock", "won't", "hyphen-ated",
            "trailing's", "s", "'s",
        ]
        for w in words:
            assert get_arpabet(w, ours_cmu) == \
                ref_text.get_arpabet(w, ref_cmu), w

    def test_end_to_end_clean_then_sequence(self, ref_text):
        """The whole frontend: flowtron_cleaners -> text_to_sequence,
        ours vs the reference's executed pipeline."""
        from flowtron_tpu.text import text_to_sequence, cleaners as cl
        from flowtron_tpu.text.cmudict import CMUDict
        cl.set_acronym_cmudict(CMUDict(CMUDICT_PATH,
                                       keep_ambiguous=False))
        for text in CLEANERS_CASES:
            ours = text_to_sequence(cl.flowtron_cleaners(text))
            ref = ref_text.text_to_sequence(
                ref_text.cleaners.flowtron_cleaners(text))
            assert ours == ref, text

    def test_fuzz_clean_then_sequence(self, ref_text):
        import random
        from flowtron_tpu.text import text_to_sequence, cleaners as cl
        from flowtron_tpu.text.cmudict import CMUDict
        cl.set_acronym_cmudict(CMUDict(CMUDICT_PATH,
                                       keep_ambiguous=False))
        rng = random.Random(0xC1EA)
        vocab = ["the", "Dr.", "No.", "NASA", "$5", "10:30am", "1,234",
                 "3.14", "21st", "1950's", "CAT-scan", "it's", "100 F",
                 "£9", "word", "{AY1 TEST}", "x", "7", "VII", "I.O.U.",
                 "café"]
        for i in range(120):
            text = " ".join(rng.choice(vocab)
                            for _ in range(rng.randrange(1, 10)))
            ours = text_to_sequence(cl.flowtron_cleaners(text))
            ref = ref_text.text_to_sequence(
                ref_text.cleaners.flowtron_cleaners(text))
            assert ours == ref, text

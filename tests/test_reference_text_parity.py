"""Text-pipeline parity against the reference's ACTUAL text modules.

The reference package `text/__init__.py` can't import in-container
(cleaners.py needs unidecode, numbers.py needs inflect — neither is
baked in; those two modules stay hand-oracle-pinned in test_text.py).
But `datestime.py` and `cmudict.py` are dependency-free and
`acronyms.py` only needs its sibling cmudict, so all three can be
executed directly (reference:text/datestime.py, text/cmudict.py,
text/acronyms.py) and compared against ours — including on the
vendored byte-identical `data/cmudict_dictionary`.

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

"""Property-based robustness for the text frontend: arbitrary input
must never crash the cleaner/sequencer pipeline (a TTS server feeds it
raw user text), and structural invariants must hold.
"""

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from flowtron_tpu.text import text_to_sequence, sequence_to_text  # noqa: E402
from flowtron_tpu.text.symbols import symbols  # noqa: E402
from flowtron_tpu.text.cleaners import (  # noqa: E402
    english_cleaners, flowtron_cleaners, transliteration_cleaners,
)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_text_to_sequence_total(s):
    ids = text_to_sequence(s)
    assert all(0 <= i < len(symbols) for i in ids)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=0,
                                      max_codepoint=0x2FFFF),
               max_size=100))
def test_cleaners_total_on_wide_unicode(s):
    for clean in (english_cleaners, flowtron_cleaners,
                  transliteration_cleaners):
        out = clean(s)
        assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, len(symbols) - 1), max_size=50))
def test_sequence_to_text_total(ids):
    out = sequence_to_text(ids)
    assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz ',.!?;:-",
               max_size=120))
def test_ascii_roundtrip_stability(s):
    """Cleaned ASCII text maps to ids and back without new symbols
    appearing (modulo arpabet braces, which need a dictionary)."""
    ids = text_to_sequence(s)
    back = sequence_to_text(ids)
    ids2 = text_to_sequence(back)
    assert ids == ids2

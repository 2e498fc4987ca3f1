"""Text frontend tests: symbol table, cleaners, phonemization, sequences.

Golden values are hand-derived from the reference behavior
(reference:text/, verified against inflect/keithito conventions).
"""

import pytest

from flowtron_tpu.text import (
    text_to_sequence, sequence_to_text, get_arpabet, _clean_text,
    set_heteronyms_path,
)
from flowtron_tpu.text.symbols import symbols
from flowtron_tpu.text.cmudict import CMUDict, VALID_SYMBOLS
from flowtron_tpu.text.numwords import number_to_words
from flowtron_tpu.text import cleaners


class TestSymbols:
    def test_count(self):
        assert len(symbols) == 185

    def test_arpabet_inventory(self):
        assert len(VALID_SYMBOLS) == 84
        # Reference ordering: lexicographic with stress variants adjacent.
        assert VALID_SYMBOLS[:5] == ["AA", "AA0", "AA1", "AA2", "AE"]
        assert VALID_SYMBOLS[-1] == "ZH"

    def test_char_ids(self):
        # '!' first, 'H' = 49+7, 'i' = 75+8, first arpabet at 101
        assert symbols[0] == "!"
        assert symbols[56] == "H"
        assert symbols[83] == "i"
        assert symbols[101] == "@AA"


class TestSequence:
    def test_plain_text(self):
        assert text_to_sequence("Hi!") == [56, 83, 0]

    def test_arpabet_curly(self):
        seq = text_to_sequence("{AA}")
        assert seq == [101]

    def test_mixed_roundtrip(self):
        s = "Turn left on {HH AW1 S} Street."
        seq = text_to_sequence(s)
        assert sequence_to_text(seq) == s

    def test_drops_unknown(self):
        # '_' and '~' and out-of-table symbols are dropped
        assert text_to_sequence("_a~") == [text_to_sequence("a")[0]]


class TestNumwords:
    @pytest.mark.parametrize("n,expected", [
        (0, "zero"),
        (7, "seven"),
        (15, "fifteen"),
        (21, "twenty-one"),
        (100, "one hundred"),
        (101, "one hundred and one"),
        (123, "one hundred and twenty-three"),
        (1000, "one thousand"),
        (1234, "one thousand, two hundred and thirty-four"),
        (1000000, "one million"),
        (1234567,
         "one million, two hundred and thirty-four thousand, "
         "five hundred and sixty-seven"),
    ])
    def test_cardinal(self, n, expected):
        assert number_to_words(n) == expected

    def test_no_andword(self):
        assert number_to_words(123, andword="") == "one hundred twenty-three"

    def test_ordinal_string(self):
        assert number_to_words("1st") == "first"
        assert number_to_words("2nd") == "second"
        assert number_to_words("3rd") == "third"
        assert number_to_words("12th") == "twelfth"
        assert number_to_words("21st") == "twenty-first"
        assert number_to_words("20th") == "twentieth"
        assert number_to_words("101st") == "one hundred and first"

    def test_decimal_string(self):
        assert number_to_words("3.14") == "three point one four"
        assert number_to_words("3.5") == "three point five"

    def test_group2(self):
        assert number_to_words(2015, andword="", zero="oh", group=2) == \
            "twenty, fifteen"
        assert number_to_words(2105, andword="", zero="oh", group=2) == \
            "twenty-one, oh five"
        assert number_to_words(1950, andword="", zero="oh", group=2) == \
            "nineteen, fifty"


class TestCleaners:
    def test_whitespace_and_hyphens(self):
        assert cleaners.flowtron_cleaners("a  well-known   cat") == \
            "a well known cat"

    def test_times(self):
        out = cleaners.flowtron_cleaners("at 9:30am sharp")
        assert out == "at nine thirty {EY1} {EH1 M} sharp" or \
            out == "at nine thirty AM sharp" or "nine thirty" in out

    def test_numbers_year(self):
        assert cleaners.flowtron_cleaners("in 1950 it") == \
            "in nineteen fifty it"
        assert cleaners.flowtron_cleaners("the 1950's were") == \
            "the nineteen fifties were"

    def test_numbers_plain(self):
        assert cleaners.flowtron_cleaners("I have 123 cats") == \
            "I have one hundred twenty three cats"

    def test_year_2000s(self):
        assert cleaners.flowtron_cleaners("in 2008,") == \
            "in two thousand eight,"
        # the %100==0 branch keeps inflect's hyphen (reference:text/numbers.py:78)
        assert cleaners.flowtron_cleaners("by 2500 AD") == \
            "by twenty-five hundred {EY1} {D IY1}"

    def test_dollars(self):
        # the dollars regex consumes the trailing space via its `[ ]?`
        assert cleaners.flowtron_cleaners("costs $5.50 total") == \
            "costs five dollars, fifty cents total"
        # the bare 4 is later picked up by the plain-number rule
        assert cleaners.flowtron_cleaners("worth $4 million now") == \
            "worth four million dollars  now"

    def test_pounds(self):
        assert cleaners.flowtron_cleaners("paid £50 for") == \
            "paid fifty pounds for"

    def test_ordinals(self):
        assert cleaners.flowtron_cleaners("the 25th of May") == \
            "the twenty-fifth of May"

    def test_safe_abbreviations(self):
        assert cleaners.flowtron_cleaners("No. 7 on the list") == \
            "number 7 on the list".replace("7", "seven")

    def test_no_lowercasing(self):
        # flowtron_cleaners preserves case (unlike english_cleaners)
        assert cleaners.flowtron_cleaners("Keep Case") == "Keep Case"

    def test_measurements(self):
        assert cleaners.flowtron_cleaners("it was 75F outside") == \
            "it was seventy-five fahrenheit outside"


class TestTransliteration:
    """Golden tests for the unidecode-grade ASCII fold
    (reference pipelines: reference:text/cleaners.py:63-70,99-112)."""

    def test_accents_nfkd(self):
        assert cleaners.convert_to_ascii("café naïve São Tomé") == \
            "cafe naive Sao Tome"

    def test_latin_specials_transliterated_not_deleted(self):
        assert cleaners.convert_to_ascii("Straße") == "Strasse"
        assert cleaners.convert_to_ascii("Ærø") == "AEro"
        assert cleaners.convert_to_ascii("œuvre") == "oeuvre"
        assert cleaners.convert_to_ascii("Þórður") == "Thordur"
        assert cleaners.convert_to_ascii("Łódź") == "Lodz"

    def test_greek(self):
        assert cleaners.convert_to_ascii("αβγ Ωμέγα χψ") == "abg Omega khps"

    def test_cyrillic(self):
        assert cleaners.convert_to_ascii("Щука живёт") == "Shchuka zhivet"
        assert cleaners.convert_to_ascii("Юрий Чайковский") == \
            "Yurii Chaikovskii"

    def test_punctuation_and_symbols(self):
        assert cleaners.convert_to_ascii("“quoted” — it’s…") == \
            '"quoted" -- it\'s...'
        assert cleaners.convert_to_ascii("25°C © 2020") == "25degC (c) 2020"

    def test_unmapped_scripts_dropped(self):
        # documented divergence from unidecode: no CJK tables in-tree
        assert cleaners.convert_to_ascii("abc漢字def") == "abcdef"

    def test_transliteration_cleaners_pipeline(self):
        assert cleaners.transliteration_cleaners("  Große   ΔΩΜΑ  ") == \
            " grosse doma "

    def test_english_cleaners_pipeline(self):
        assert cleaners.english_cleaners("Dr. Müller bought 2 œufs") == \
            "doctor muller bought two oeufs"


class TestArpabet:
    def test_lookup(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        assert get_arpabet("cat", cmu) == "{K AE1 T}"
        assert get_arpabet("cat,", cmu) == "{K AE1 T},"
        assert get_arpabet("(cat)", cmu) == "({K AE1 T})"

    def test_heteronym_skipped(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        assert get_arpabet("read", cmu) == "read"

    def test_ambiguous_dropped(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        # HOUSE has two pronunciations -> dropped when keep_ambiguous=False
        assert get_arpabet("house", cmu) == "house"

    def test_possessive(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        assert get_arpabet("dog's", cmu) == "{D AO1 G Z}"

    def test_unknown_word(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        assert get_arpabet("zzyzx", cmu) == "zzyzx"


class TestCleanText:
    def test_dispatch(self):
        assert _clean_text("A  B", ["basic_cleaners"]) == "a b"
        with pytest.raises(ValueError):
            _clean_text("x", ["nonexistent_cleaners"])


class TestNumwordsEdgeCases:
    @pytest.mark.parametrize("n,expected", [
        (1000000000, "one billion"),
        (1000000000000, "one trillion"),
        (2001, "two thousand and one"),
        (110, "one hundred and ten"),
        (1100, "one thousand, one hundred"),
        (999999, "nine hundred and ninety-nine thousand, "
                 "nine hundred and ninety-nine"),
    ])
    def test_large_cardinals(self, n, expected):
        assert number_to_words(n) == expected

    def test_negative(self):
        assert number_to_words(-5) == "minus five"

    def test_ordinal_large(self):
        assert number_to_words("100th") == "one hundredth"
        assert number_to_words("1000th") == "one thousandth"
        assert number_to_words("30th") == "thirtieth"

    def test_non_numeric_passthrough(self):
        assert number_to_words("abc") == "abc"

    def test_its_not_possessivized(self, mini_cmudict, mini_heteronyms):
        cmu = CMUDict(mini_cmudict, keep_ambiguous=False)
        set_heteronyms_path(mini_heteronyms)
        # "it's" is explicitly excluded from the 's -> Z rule
        out = get_arpabet("it's", cmu)
        assert out == "it's"

    def test_times_without_minutes(self):
        # without a CMUdict, PM is spelled letter by letter (reference
        # behavior with a dict is "{P IY1 EH1 M}")
        assert cleaners.flowtron_cleaners("see you at 5pm!") == \
            "see you at five {P IY1} {EH1 M}!"

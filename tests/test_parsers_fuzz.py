"""Property-based fuzzing of the VLM answer parsers.

The parsers run on arbitrary model output (the reference pipeline feeds
them raw ``generate`` text, `/root/reference/scripts/prompt_inference.py:78`),
so their contract is total: any string → a complete label dict with values
in the documented ranges, never an exception. Hypothesis hammers that
contract with adversarial unicode, huge strings, and numeric edge cases.
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from vlm_tpu.data import parsers

TEXT = st.text(max_size=300)


class TestParserTotality:
    @settings(max_examples=300, deadline=None)
    @given(TEXT)
    def test_mivia_parser_total(self, s):
        out = parsers.parse_mivia_par_output(s)
        assert set(out) == {"upper", "lower", "gender", "bag", "hat"}
        assert out["upper"] in set(range(1, 12)) | {-1}
        assert out["lower"] in set(range(1, 12)) | {-1}
        assert out["gender"] in {0, 1, -1}
        assert out["bag"] in {0, 1, -1}
        assert out["hat"] in {0, 1, -1}

    @settings(max_examples=300, deadline=None)
    @given(TEXT, st.booleans())
    def test_face_parser_total(self, s, age_reg):
        out = parsers.parse_face_output(s, age_is_regression=age_reg,
                                        rng=random.Random(0))
        assert set(out) == {"gender", "age", "ethnicity", "emotion"}
        assert out["gender"] in {0, 1, -1}
        assert out["ethnicity"] in {0, 1, 2, 3, -1}
        assert out["emotion"] in set(range(7)) | {-1}
        if age_reg:
            assert isinstance(out["age"], float)
        else:
            assert out["age"] in set(range(9)) | {-1}

    @settings(max_examples=200, deadline=None)
    @given(st.one_of(TEXT, st.integers(), st.floats(allow_nan=True),
                     st.none()))
    def test_safe_converters_total(self, v):
        assert isinstance(parsers.to_int_safe(v), int)
        assert isinstance(parsers.to_float_safe(v), float)
        assert parsers.to_bin_safe(v) in {0, 1, -1}

    @settings(max_examples=200, deadline=None)
    @given(TEXT)
    def test_field_parsers_total(self, s):
        assert parsers.parse_yesno(s) in {0, 1, -1}
        assert parsers.match_color(s) in set(range(1, 12)) | {-1}
        assert parsers.parse_gender(s) in {0, 1, -1}
        assert parsers.parse_emotion(s) in set(range(7)) | {-1}
        assert parsers.parse_ethnicity(
            s, rng=random.Random(0)) in {0, 1, 2, 3, -1}

    @settings(max_examples=100, deadline=None)
    @given(st.floats(allow_nan=True, allow_infinity=True))
    def test_age_binning_total(self, v):
        assert parsers.age_float_to_class(v) in set(range(9)) | {-1}

"""Parser golden tests (reference semantics: face_dataset.py:127-198,
mivia_par_dataset.py:93-170)."""

import random

from vlm_tpu.data import parsers


class TestFaceParser:
    def test_happy_path(self):
        out = parsers.parse_face_output("Male, 27.5, Asian Indian, Happiness")
        assert out == {"gender": 0, "age": 3, "ethnicity": 3, "emotion": 3}

    def test_female_checked_before_male(self):
        # "male" is a substring of "female": order matters.
        assert parsers.parse_face_output("female, 30, caucasian, neutral")["gender"] == 1
        assert parsers.parse_face_output("Male, 30, caucasian, neutral")["gender"] == 0

    def test_age_binning(self):
        for age, cls in [(0, 0), (2, 0), (2.5, 1), (9, 1), (9.5, 2), (19, 2),
                         (20, 3), (29, 3), (39, 4), (49, 5), (59, 6), (69, 7),
                         (70, 8), (120, 8)]:
            got = parsers.parse_face_output(f"male, {age}, caucasian, neutral")
            assert got["age"] == cls, (age, got["age"], cls)

    def test_age_regression_mode(self):
        out = parsers.parse_face_output("male, 27.5, caucasian, neutral",
                                        age_is_regression=True)
        assert out["age"] == 27.5

    def test_ethnicity_fuzzy(self):
        f = lambda s: parsers.parse_face_output(f"male, 30, {s}, neutral")["ethnicity"]
        assert f("caucasian") == 0
        assert f("caucasian latin") == 0
        assert f("african american") == 1
        assert f("east asian") == 2
        assert f("asian indian") == 3
        assert f("indian asian person") == 3   # "indian" wins inside asian branch
        assert f("martian") == -1

    def test_asian_tie_break_is_seeded(self):
        # Plain "asian" picks randomly between east asian (2) / asian indian (3).
        rng = random.Random(0)
        vals = {parsers.parse_ethnicity("asian", rng=rng) for _ in range(50)}
        assert vals <= {2, 3} and len(vals) == 2

    def test_emotion_substring(self):
        f = lambda s: parsers.parse_face_output(f"male, 30, caucasian, {s}")["emotion"]
        assert f("surprise") == 0
        assert f("full of happiness") == 3
        assert f("neutral expression") == 6
        assert f("bored") == -1

    def test_incomplete_output_all_missing(self):
        out = parsers.parse_face_output("male, 30")
        assert out == {"gender": -1, "age": -1, "ethnicity": -1, "emotion": -1}
        out = parsers.parse_face_output("garbage", age_is_regression=True)
        assert out["age"] == -1.0


class TestMiviaParser:
    def test_happy_path(self):
        out = parsers.parse_mivia_par_output("Black, Blue, Male, No, Yes")
        assert out == {"upper": 1, "lower": 2, "gender": 0, "bag": 0, "hat": 1}

    def test_dark_aliases_black(self):
        assert parsers.parse_mivia_par_output(
            "dark, dark gray, female, yes, no")["upper"] == 1

    def test_first_color_match_wins_in_dict_order(self):
        # "dark red" contains both "dark"(→1) and "red"(→9); dict order wins.
        out = parsers.parse_mivia_par_output("dark red, purple, male, no, no")
        assert out["upper"] == 1
        assert out["lower"] == 8

    def test_yesno_substrings(self):
        out = parsers.parse_mivia_par_output("black, white, male, yes., no bag")
        assert out["bag"] == 1 and out["hat"] == 0

    def test_incomplete_all_missing(self):
        out = parsers.parse_mivia_par_output("black, white, male")
        assert out == {"upper": -1, "lower": -1, "gender": -1,
                       "bag": -1, "hat": -1}

    def test_unknown_color(self):
        assert parsers.parse_mivia_par_output(
            "chartreuse, black, male, no, no")["upper"] == -1


class TestHelpers:
    def test_to_bin_safe(self):
        assert parsers.to_bin_safe("yes") == 1
        assert parsers.to_bin_safe("NO") == 0
        assert parsers.to_bin_safe(1) == 1
        assert parsers.to_bin_safe("0") == 0
        assert parsers.to_bin_safe(7) == -1
        assert parsers.to_bin_safe("maybe") == -1

    def test_color_to_id_numeric_passthrough(self):
        assert parsers.color_to_id(7) == 7
        assert parsers.color_to_id("9") == 9
        assert parsers.color_to_id("yellow") == 11

    def test_safe_conversions(self):
        assert parsers.to_int_safe(None) == -1
        assert parsers.to_int_safe(float("nan")) == -1
        assert parsers.to_int_safe("3") == 3
        assert parsers.to_float_safe("x", default=-1.0) == -1.0

    def test_float_formatted_csv_labels(self):
        # pandas writes integer columns containing NaN as floats ("1.0");
        # those labels must still load rather than degrade to missing.
        assert parsers.to_int_safe("1.0") == 1
        assert parsers.to_int_safe("0.0") == 0
        assert parsers.to_int_safe("1.5") == -1     # genuinely non-integer
        assert parsers.to_bin_safe("1.0") == 1
        assert parsers.to_bin_safe("0.0") == 0

    def test_parse_yesno_words_not_substrings(self):
        assert parsers.parse_yesno("yes.") == 1
        assert parsers.parse_yesno("no bag") == 0
        # hedges must NOT count as a confident "no"
        assert parsers.parse_yesno("unknown") == -1
        assert parsers.parse_yesno("none visible") == -1
        assert parsers.parse_yesno("cannot tell") == -1

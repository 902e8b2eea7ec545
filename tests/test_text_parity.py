"""Golden parity tests for the text kernel.

Expected values are the reference's own golden assertions
(DeezyMatch/tests/test_utils.py:8-203), restated as parametrized
tables, plus extra NFKD/multi-script cases the reference does not
cover but whose behavior is fixed by `unicodedata.normalize("NFKD",.)`.
"""

import pytest

from deezymatch_spark.text import (
    Vocabulary,
    encode_tokens,
    missing_char_ratio,
    normalize_string,
    pad_sequence,
    string_split,
)

X = "py 001 $  "


@pytest.mark.parametrize(
    "kwargs, expected",
    [
        (
            dict(tokenize=["char"], prefix_suffix=["|", "|"]),
            list("|py 001 $  |"),
        ),
        (
            dict(tokenize=["char"], prefix_suffix=["|", ""]),
            list("|py 001 $  "),
        ),
        (dict(tokenize=["char"], prefix_suffix=[""]), list("py 001 $  ")),
        (dict(tokenize=["char"], prefix_suffix=""), list("py 001 $  ")),
        (
            dict(tokenize=["ngram"], min_gram=1, max_gram=1, prefix_suffix=""),
            list("py 001 $  "),
        ),
        (
            dict(
                tokenize=["ngram", "word"],
                min_gram=3,
                max_gram=3,
                token_sep="$",
                prefix_suffix="",
            ),
            ["py ", "y 0", " 00", "001", "01 ", "1 $", " $ ", "$  ", "py 001 ", "  "],
        ),
        (
            dict(
                tokenize=["ngram", "word"],
                min_gram=3,
                max_gram=3,
                token_sep="$",
                prefix_suffix=["|", "|"],
            ),
            [
                "|py", "py ", "y 0", " 00", "001", "01 ", "1 $", " $ ", "$  ", "  |",
                "py 001 ", "  ",
            ],
        ),
        (
            dict(tokenize=["word"], token_sep="default", prefix_suffix=""),
            ["py", "001"],
        ),
        (
            dict(tokenize=["word"], token_sep="$", prefix_suffix=""),
            ["py 001 ", "  "],
        ),
        (
            dict(tokenize=["word"], token_sep="$ ", prefix_suffix=""),
            ["py", "001"],
        ),
    ],
)
def test_string_split_golden(kwargs, expected):
    assert string_split(X, **kwargs) == expected


def test_string_split_gram_bound_assertions():
    with pytest.raises(AssertionError):
        string_split(X, tokenize=["char", "ngram", "word"], min_gram=0, max_gram=3)
    with pytest.raises(AssertionError):
        string_split(X, tokenize=["char", "ngram", "word"], min_gram=3, max_gram=2)


def test_normalize_string_golden():
    x = " PY _ 001 $ :)  .  .  "
    assert normalize_string(x, lowercase=True, strip=True) == "py _ 001 $ :)  .  ."
    assert normalize_string(x, lowercase=False, strip=True) == "PY _ 001 $ :)  .  ."
    assert normalize_string(x, lowercase=False, strip=False) == x


def test_normalize_nfkd_is_not_ascii_fold():
    # NFKD decomposes; combining marks SURVIVE (string lengthens).
    out = normalize_string("Ω Café Ⅻ")
    assert out == "ω café xii"
    # order: NFKD -> lower -> strip; ﬁ ligature expands
    assert normalize_string(" ﬁn ") == "fin"


def test_normalize_only_latin_letters():
    assert (
        normalize_string("Ab?c1 д!", only_latin_letters=True) == "ab ?c д !"
        or True
    )
    # exact regex semantics: [.!?] padded with leading space, then
    # non-latin runs collapsed to single space
    s = normalize_string("Ab?c1 д!", only_latin_letters=True)
    assert s == "ab ?c !"


def test_vocab_insertion_order_and_reserved():
    v = Vocabulary()
    v.add_tokens(["b", "a", "b", "c"])
    assert v.tok2index == {"_PAD": 0, "_UNK": 1, "b": 2, "a": 3, "c": 4}
    assert v.tok2count == {"b": 2, "a": 1, "c": 1}
    rows = v.to_rows()
    v2 = Vocabulary.from_rows(rows)
    assert v2.tok2index == v.tok2index
    assert v2.n_tok == v.n_tok


def test_encode_drops_unknown():
    v = Vocabulary()
    v.add_tokens(["a", "b"])
    # unknown 'z' dropped, NOT mapped to _UNK (data_processing.py:368-375)
    assert encode_tokens(["a", "z", "b"], v.tok2index) == [2, 3]
    assert missing_char_ratio(2, 3) == pytest.approx(1 / 3)
    assert missing_char_ratio(0, 0) == 1.0  # empty → ratio 1 → filtered


def test_pad_sequence():
    p, n = pad_sequence([5, 6, 7], 5)
    assert p.tolist() == [5, 6, 7, 0, 0] and n == 3
    p, n = pad_sequence([5, 6, 7], 2)
    assert p.tolist() == [5, 6] and n == 2
    assert p.dtype.name == "int64"

"""S1/P6 parity: the TSV loader must reproduce the reference's
two-pass label scrub (data_processing.py:44-66) exactly — including the
quirk that the second pass's str.contains("true|false") filter DROPS
the '1'/'0' rows the first pass whitelisted — plus the .str.strip() of
s1/s2/label at load."""

import re

from deezymatch_spark.sources.tsv import read_pairs_tsv


def reference_load(lines):
    """Line-by-line re-execution of data_processing.py:44-66 semantics
    (pure Python, no pandas): first-pass whitelist, strip, second-pass
    contains filter, (?i)TRUE/FALSE -> bool."""
    out = []
    for ln in lines:
        sp = ln.rstrip("\n").split("\t")
        if len(sp) < 3:
            # reference would raise IndexError on tmp_split_row[2];
            # documented deviation: we drop such rows instead
            continue
        if str(sp[2]).strip().lower() not in ["true", "false", "1", "0"]:
            continue  # SKIP path (replaced with remove_me then dropped)
        s1, s2, lab = (sp[0].strip(), sp[1].strip(), sp[2].strip())
        if not re.search("true|false", lab, re.I):
            continue  # second pass drops 1/0
        out.append((s1, s2, bool(re.fullmatch("true", lab, re.I))))
    return out


LINES = [
    "london\tLondres\ttrue",
    "paris\tparys\tTRUE",
    " berlin \t berlino\t FALSE ",          # whitespace everywhere
    "rome\troma\t1",                         # first pass OK, second pass DROPS
    "wien\tvienna\t0",                       # same
    "oslo\tosloo\tFalse",
    "kyiv\tkiev\tmaybe",                     # SKIP
    "lisbon\tlisboa\t  true",
    "tab\tin\tlabel\textra\tcolumns\ttrue",  # label col is 'label' -> SKIP
    "a\tb\tfalse\textra",                    # extra cols ignored, label ok
    "short_line",                            # <3 cols
    "x\ty\tTrUe",
]


def test_tsv_two_pass_label_parity(spark, tmp_path):
    p = tmp_path / "pairs.tsv"
    p.write_text("\n".join(LINES) + "\n")
    got = [
        (r.s1, r.s2, r.label)
        for r in read_pairs_tsv(spark, str(p)).orderBy("original_index").collect()
    ]
    want = reference_load(LINES)
    assert got == want
    # the 1/0 rows specifically must be gone
    assert all(s1 not in ("rome", "wien") for s1, _, _ in got)
    # strip parity
    assert ("berlin", "berlino", False) in got

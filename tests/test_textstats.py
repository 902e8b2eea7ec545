"""Text-analysis operators: language-ID over all 10 marker sets,
quality scoring shape, deterministic tie-break."""

from pyspark.sql import functions as F

from deezymatch_spark.functions.textstats import LANG_MARKERS, lang_id, quality_score

SENTENCES = {
    "en": "the cat and the dog of the house is to be seen",
    "de": "der hund und die katze das haus ist der garten",
    "es": "el perro y la casa los gatos que es grande",
    "fr": "le chien et la maison les chats est une belle",
    "it": "il cane che corre di casa per la strada con il gatto",
    "pt": "uma casa para o gato com os amigos mais perto",
    "nl": "het huis is een hond van niet weten dat het",
    "sv": "och huset att det ar som har en hund",
    "pl": "nie wiem czy to jest dobre jak ale mysle",
    "tr": "bir ev ve bu kedi ile ama simdi bir",
}


def test_lang_id_detects_all_marker_languages(spark):
    rows = [(code, s) for code, s in SENTENCES.items()]
    df = spark.createDataFrame(rows, "expected string, text string")
    got = df.select("expected", lang_id(F.col("text")).alias("pred")).collect()
    for r in got:
        assert r.pred == r.expected, (r.expected, r.pred)


def test_lang_id_und_and_tie_break(spark):
    df = spark.createDataFrame(
        [("zzz qqq xxx 123",),      # no markers anywhere
         ("la la",)],               # 'la' is in both es and fr lists →
                                    # tie broken to the LARGEST code (fr)
        ["text"],
    )
    got = [r.pred for r in df.select(lang_id(F.col("text")).alias("pred")).collect()]
    assert got[0] == "und"
    assert got[1] == "fr"


def test_marker_sets_shape():
    assert len(LANG_MARKERS) == 10
    for code, ws in LANG_MARKERS.items():
        assert len(code) == 2
        assert len(ws) == 5 and all(w == w.lower() for w in ws)


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog " * 5,),
         ("!!!???;;;",)],
        ["text"],
    )
    got = [r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= q <= 1.0 for q in got)
    assert got[0] > got[1]


def test_repetition_stats(spark):
    from deezymatch_spark.functions import repetition_stats

    rows = [
        (1, "alpha one. beta two. alpha one"),        # 1 of 3 sents repeated
        (2, "word word word other"),                   # top word 3/4
        (3, ""),                                       # empty doc
        (4, "unique sentence"),
        (5, None),                                     # failed extraction
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.r.n_sents, r.r.dup_sent_frac_micro, r.r.top_word_frac_micro)
        for r in df.select(
            "doc_id", repetition_stats(F.col("text")).alias("r")
        ).collect()
    }
    # whitespace words keep punctuation: [alpha, one., beta, two.,
    # alpha, one] -> "alpha" tops at 2 of 6
    assert got[1] == (3, 333333, 333333)
    assert got[2] == (1, 0, 750000)
    assert got[3] == (0, 0, 0)
    assert got[4] == (1, 0, 500000)
    assert got[5] == (0, 0, 0)  # NULL text == empty, never size(NULL) = -1


def test_pii_masking(spark):
    from deezymatch_spark.functions import mask_pii, pii_stats

    rows = [
        (1, "mail john.doe+x@Example.co.uk or admin@sub.domain.org now"),
        (2, "server at 192.168.0.1 and 10.0.0.255."),
        (3, "call +1 415 555 2671 or 0044-20-7946-0958 now"),
        (4, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.m, r.p.n_emails, r.p.n_ips, r.p.n_phones)
        for r in df.select(
            "doc_id", mask_pii("text").alias("m"), pii_stats("text").alias("p")
        ).collect()
    }
    assert got[1] == ("mail [EMAIL] or [EMAIL] now", 2, 0, 0)
    assert got[2] == ("server at [IP] and [IP].", 0, 2, 0)
    assert got[3] == ("call [PHONE] or [PHONE] now", 0, 0, 2)
    assert got[4] == ("no pii here at all", 0, 0, 0)


def test_char_entropy_known_values(spark):
    from deezymatch_spark.functions import char_entropy

    rows = [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.e
        for r in df.select(
            "doc_id", F.round(char_entropy(F.col("text")), 9).alias("e")
        ).collect()
    }
    assert got[1] == 0.0          # single repeated char
    assert got[2] == 1.0          # two equiprobable chars = 1 bit
    assert got[3] == 2.0          # four equiprobable chars = 2 bits
    assert got[4] == 0.0 and got[5] == 0.0


def test_hash_sample_deterministic_and_nested(spark):
    from deezymatch_spark.operators import hash_sample, stratified_hash_sample

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s20 = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    # deterministic under repartitioning (df.sample can't promise this)
    s20b = {
        r.doc_id for r in hash_sample(d.repartition(13), "doc_id", 0.2).collect()
    }
    assert s20 == s20b
    # nested across fractions at the same salt; independent salts differ
    s40 = {r.doc_id for r in hash_sample(d, "doc_id", 0.4).collect()}
    assert s20 <= s40
    other = {r.doc_id for r in hash_sample(d, "doc_id", 0.2, salt="x").collect()}
    assert other != s20
    # rate lands near the target
    assert 0.1 < len(s40) / d.count() < 0.7

    strat = stratified_hash_sample(
        d, "doc_id", "lang", {"en": 1.0, "zh": 0.0}, default_fraction=0.2
    )
    by_lang = {
        r.lang: r.n
        for r in strat.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_en = d.where(F.col("lang") == "en").count()
    assert by_lang.get("en") == n_en      # fraction 1.0 keeps everything
    assert "zh" not in by_lang            # fraction 0.0 drops everything

    import pytest

    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        hash_sample(d, "doc_id", 1.5)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        stratified_hash_sample(d, "doc_id", "lang", {"en": -0.1})


def test_char_ngram_lm_score(spark):
    """CCNet-shape LM: probabilities normalize per prefix, fluent text
    scores lower NLL than gibberish, unseen grams take the floor."""
    from deezymatch_spark.operators import char_ngram_lm, lm_score
    from deezymatch_spark.operators.lm import UNSEEN_LOGP_MICRO

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat too") for i in range(4)],
        "doc_id long, text string",
    )
    lm = char_ngram_lm(ref, "text", n=3, min_count=2)
    rows = {r.gram: r.logp_micro for r in lm.collect()}
    assert rows and all(lp <= 0 for lp in rows.values())
    # P("he " | "he") etc. normalize: grouped by 2-char prefix the
    # probs sum to <= 1 (pruned tail can remove mass, never add)
    import collections
    import math

    by_prefix = collections.defaultdict(float)
    for gram, lp in rows.items():
        by_prefix[gram[:2]] += math.exp(lp / 1e6)
    assert all(s <= 1.0 + 1e-6 for s in by_prefix.values())

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),          # in-distribution
            (2, "zxqj vvkw qqpz xjzz wqkv"),        # gibberish, unseen grams
            (3, "ab"),                              # shorter than n -> 0 grams
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in lm_score(docs, "doc_id", "text", lm).collect()}
    assert got[1].nll_micro < got[2].nll_micro
    assert got[2].nll_micro == -UNSEEN_LOGP_MICRO  # every gram unseen
    assert (got[3].n_grams, got[3].nll_micro) == (0, 0)

"""Token-budget domain mixing (operators/sampling.py: plan_token_mix /
apply_token_mix) — the GPT-3/LLaMA data-recipe arithmetic: rates from
(weights, budget, available tokens); materialization by deterministic
hash with up-sampling copies.
"""

import pytest
from pyspark.sql import functions as F

from deezymatch_spark.operators import apply_token_mix, plan_token_mix

DENOM = 1_000_000


@pytest.fixture(scope="module")
def corpus(spark):
    # web: 200 docs x 100 tokens = 20_000 tokens available
    # wiki: 50 docs x 40 tokens  =  2_000 tokens available
    rows = [(i, "web", 100) for i in range(200)]
    rows += [(1000 + i, "wiki", 40) for i in range(50)]
    rows += [(2000, "junk", 10_000)]
    return spark.createDataFrame(rows, ["doc_id", "domain", "n_tokens"])


def test_plan_rates_hit_budget(corpus):
    rates = plan_token_mix(
        corpus, "domain", "n_tokens",
        weights={"web": 0.8, "wiki": 0.2}, budget_tokens=10_000,
    )
    # web target 8_000 of 20_000 -> 0.4; wiki target 2_000 of 2_000 -> 1.0
    assert rates == {"web": 400_000, "wiki": 1_000_000}


def test_plan_upsamples_scarce_domain(corpus):
    rates = plan_token_mix(
        corpus, "domain", "n_tokens",
        weights={"web": 0.5, "wiki": 0.5}, budget_tokens=10_000,
    )
    # wiki target 5_000 of 2_000 available -> 2.5 epochs
    assert rates == {"web": 250_000, "wiki": 2_500_000}


def test_plan_zero_and_missing_strata(corpus):
    rates = plan_token_mix(
        corpus, "domain", "n_tokens",
        weights={"web": 1.0, "books": 1.0}, budget_tokens=4_000,
    )
    assert rates == {"books": 0, "web": 100_000}


def test_plan_arg_validation(corpus):
    with pytest.raises(ValueError):
        plan_token_mix(corpus, "domain", "n_tokens", {}, 100)
    with pytest.raises(ValueError):
        plan_token_mix(corpus, "domain", "n_tokens", {"web": -1.0}, 100)
    with pytest.raises(ValueError):
        plan_token_mix(corpus, "domain", "n_tokens", {"web": 0.0}, 100)
    with pytest.raises(ValueError):
        plan_token_mix(corpus, "domain", "n_tokens", {"web": 1.0}, -5)


def test_apply_copies_and_determinism(corpus):
    rates = {"web": 400_000, "wiki": 2_500_000}
    out = apply_token_mix(corpus, "doc_id", "domain", rates, salt="e0")
    rows = out.collect()
    # junk has no rate -> dropped entirely
    assert all(r.domain != "junk" for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    for doc_id, copies in by_doc.items():
        # copy_idx dense 0..n-1
        assert sorted(copies) == list(range(len(copies)))
        if doc_id < 1000:        # web: rate < 1 -> 0 or 1 copies
            assert len(copies) == 1
        else:                    # wiki: 2.5 -> every doc 2 or 3 copies
            assert len(copies) in (2, 3)
    # wiki realized tokens ~ 2.5 epochs of 2_000 = 5_000
    wiki_tokens = sum(40 for r in rows if r.domain == "wiki")
    assert 4_000 <= wiki_tokens <= 6_000
    # web realized ~ 0.4 * 20_000 = 8_000
    web_tokens = sum(100 for r in rows if r.domain == "web")
    assert 6_000 <= web_tokens <= 10_000
    # deterministic under repartitioning
    again = apply_token_mix(
        corpus.repartition(7, "domain"), "doc_id", "domain", rates, salt="e0"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different salt draws a different fractional-copy set
    other = apply_token_mix(
        corpus, "doc_id", "domain", rates, salt="e1"
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_apply_rate_exactly_one_keeps_everything(corpus):
    out = apply_token_mix(
        corpus, "doc_id", "domain",
        {"web": DENOM, "wiki": DENOM, "junk": DENOM},
    )
    assert out.count() == corpus.count()
    assert out.where(F.col("copy_idx") != 0).count() == 0


def test_apply_empty_rates_and_validation(corpus):
    assert apply_token_mix(corpus, "doc_id", "domain", {}).count() == 0
    with pytest.raises(ValueError):
        apply_token_mix(corpus, "doc_id", "domain", {"web": -1})


def test_apply_plan_is_shuffle_free(spark, corpus):
    plan = apply_token_mix(
        corpus, "doc_id", "domain", {"web": 2_500_000}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_end_to_end_budget_realized(corpus):
    """plan → apply realizes the requested budget within sampling
    noise, at the requested mixture."""
    rates = plan_token_mix(
        corpus.where("domain != 'junk'"), "domain", "n_tokens",
        weights={"web": 0.6, "wiki": 0.4}, budget_tokens=5_000,
    )
    out = apply_token_mix(corpus, "doc_id", "domain", rates).collect()
    realized = sum(r.n_tokens for r in out)
    assert 4_000 <= realized <= 6_000
    wiki = sum(r.n_tokens for r in out if r.domain == "wiki")
    assert 1_500 <= wiki <= 2_500  # target 2_000

"""BASELINE.json metric gate: pairwise F1 >= 0.99 on labeled pairs at
the pipeline's blocking key, plus blocking recall vs ALL truth pairs."""

from deezymatch_spark.eval import er_f1_eval, pairwise_f1


def test_f1_meets_north_rule_target(spark):
    m = er_f1_eval(spark, 2000)
    assert m["f1"] >= 0.99, m
    assert m["recall"] == 1.0, m
    assert m["blocking_recall"] >= 0.99, m


def test_pairwise_f1_arithmetic(spark):
    truth = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20)], "id long, cluster_id long"
    )
    # predictor merges 1,2 correctly but also wrongly pulls in 3
    pred = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 200)], "id long, entity_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id1 long, id2 long"
    )
    m = pairwise_f1(pairs, truth, pred)
    # tp = (1,2); fp = (1,3),(2,3); fn = (3,4)
    assert (m["tp"], m["fp"], m["fn"]) == (1, 2, 1)
    # metrics are rounded to 6dp
    assert abs(m["precision"] - 1 / 3) < 1e-6
    assert abs(m["recall"] - 0.5) < 1e-6

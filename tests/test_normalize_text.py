"""normalize_text (ftfy-lite encoding hygiene): per-rule planted cases plus
the pii_scrub-style plan contract — a pure projection with zero shuffles and
zero Python workers."""

from __future__ import annotations

import pytest

from open_source_search_engine_spark.operators.curation import normalize_text


def _run(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id INT, text STRING"
    )
    return {
        r["doc_id"]: r for r in normalize_text(docs).collect()
    }


def test_each_rule(spark):
    rows = _run(
        spark,
        [
            "clean text stays",                        # 0: untouched
            "has\x01ctrl\x02chars\x7f",                # 1: C0/DEL stripped
            "keep\ttab and\nnewline",                  # 2: tab+nl survive
            "zero\u200bwidth\u200c\u200d\ufeffmarks",  # 3: zw stripped
            "double  spaces\t\t and \t runs",          # 4: runs collapse
            "para\n\n\n\n\npile",                      # 5: nl pile -> 2
            "  \t padded  \n\n ",                      # 6: trim both ends
            None,                                      # 7: NULL -> empty
        ],
    )
    assert rows[0]["clean_text"] == "clean text stays"
    assert rows[0]["changed"] == 0 and rows[0]["n_ctrl"] == 0

    assert rows[1]["clean_text"] == "hasctrlchars"
    assert rows[1]["n_ctrl"] == 3 and rows[1]["changed"] == 1

    assert rows[2]["clean_text"] == "keep\ttab and\nnewline"
    assert rows[2]["changed"] == 0

    assert rows[3]["clean_text"] == "zerowidthmarks"
    assert rows[3]["n_zw"] == 4

    assert rows[4]["clean_text"] == "double spaces and runs"
    assert rows[4]["n_ws_removed"] > 0

    assert rows[5]["clean_text"] == "para\n\npile"
    assert rows[5]["n_ws_removed"] == 3

    assert rows[6]["clean_text"] == "padded"
    assert rows[6]["changed"] == 1

    assert rows[7]["clean_text"] == "" and rows[7]["changed"] == 0


def test_idempotent(spark):
    texts = ["a\x01b  c\u200b\n\n\n\nd  ", "  x  ", "ok"]
    once = _run(spark, texts)
    again = _run(spark, [once[i]["clean_text"] for i in range(len(texts))])
    for i in range(len(texts)):
        assert again[i]["clean_text"] == once[i]["clean_text"]
        assert again[i]["changed"] == 0


def test_plan_is_pure_projection(spark):
    docs = spark.createDataFrame([(1, "x  y")], "doc_id INT, text STRING")
    plan = (
        normalize_text(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

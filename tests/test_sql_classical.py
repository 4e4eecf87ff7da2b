"""Classical (parse-based) Spider evaluation + DB-content value linking.

Covers ofasys_tpu/utils/sql_classical.py (reference
ofasys/utils/spider/evaluation.py + test_suite/evaluate_classical.py) and
ofasys_tpu/utils/spider_linking.py (reference
ofasys/utils/spider/bridge_content_encoder.py).
"""

import sqlite3

import pytest

from ofasys_tpu.utils.sql_classical import (
    PARTIAL_TYPES,
    evaluate_classical,
    exact_match,
    hardness,
    parse_sql,
    partial_scores,
)


def _em(pred, gold):
    return exact_match(parse_sql(pred), parse_sql(gold))


class TestExactSetMatch:
    def test_identical(self):
        assert _em("select name from cows", "select name from cows")

    def test_value_abstraction(self):
        # literal values are ignored (reference DISABLE_VALUE=True)
        assert _em(
            "select id from cows where name = 'bessie'",
            "select id from cows where name = 'daisy'",
        )

    def test_distinct_ignored(self):
        assert _em("select distinct name from cows", "select name from cows")

    def test_case_and_alias_insensitive(self):
        assert _em(
            "SELECT T1.name FROM cows AS T1",
            "select cows.name from cows",
        )

    def test_select_order_insensitive(self):
        assert _em("select a, b from t", "select b, a from t")

    def test_wrong_column_fails(self):
        assert not _em("select id from cows", "select name from cows")

    def test_wrong_agg_fails(self):
        assert not _em("select count(*) from cows", "select max(id) from cows")

    def test_missing_where_fails(self):
        assert not _em(
            "select id from cows", "select id from cows where id > 3"
        )

    def test_wrong_table_fails(self):
        assert not _em("select name from cows", "select name from pigs")

    def test_order_direction(self):
        assert _em(
            "select name from cows order by id desc",
            "select name from cows order by id desc",
        )
        assert not _em(
            "select name from cows order by id asc",
            "select name from cows order by id desc",
        )

    def test_limit_keyword(self):
        assert not _em(
            "select name from cows order by id",
            "select name from cows order by id limit 1",
        )

    def test_iuen(self):
        assert _em(
            "select a from t union select b from u",
            "select a from t union select b from u",
        )
        assert not _em(
            "select a from t union select b from u",
            "select a from t intersect select b from u",
        )

    def test_nested_subquery(self):
        p = "select name from cows where id in (select cow_id from milk)"
        assert _em(p, p)
        assert not _em(p, "select name from cows where id in (select pig_id from ham)")

    def test_group_having(self):
        p = "select farm, count(*) from cows group by farm having count(*) > 2"
        assert _em(p, p)
        assert not _em(p, "select farm, count(*) from cows group by farm")


class TestPartialScores:
    def test_clause_f1_isolates_error(self):
        ps = partial_scores(
            parse_sql("select id from cows where id > 3"),
            parse_sql("select name from cows where id > 3"),
        )
        assert ps["where"]["f1"] == 1.0
        assert ps["select"]["f1"] == 0.0
        assert ps["keywords"]["f1"] == 1.0

    def test_all_one_on_match(self):
        q = "select farm, max(id) from cows group by farm order by farm limit 3"
        ps = partial_scores(parse_sql(q), parse_sql(q))
        assert all(ps[t]["f1"] == 1.0 for t in PARTIAL_TYPES)


class TestHardness:
    def test_buckets(self):
        assert hardness(parse_sql("select name from cows")) == "easy"
        assert hardness(parse_sql(
            "select farm, count(*) from cows group by farm")) == "medium"
        assert hardness(parse_sql(
            "select farm from cows where id > 3 group by farm "
            "order by count(*) desc limit 1")) in ("hard", "extra")
        assert hardness(parse_sql(
            "select name from cows where id in (select cow_id from milk "
            "where qty > 5) and farm = 'x' or farm = 'y' "
            "order by name limit 2")) == "extra"


class TestEvaluateClassical:
    def test_corpus_aggregation(self):
        golds = [
            "select name from cows",
            "select id from cows where name = 'x'",
            "select farm, count(*) from cows group by farm",
        ]
        preds = [
            "select name from cows",          # exact
            "select id from cows where name = 'y'",  # exact (value ignored)
            "select farm from cows",          # wrong
        ]
        out = evaluate_classical(preds, golds)
        assert out["counts"]["all"] == 3
        assert out["exact"]["all"] == pytest.approx(2 / 3)
        assert out["partial_f1"]["all"]["where"] == pytest.approx(1.0)

    def test_garbage_pred_scores_zero(self):
        out = evaluate_classical(["<<<not sql>>> ((("], ["select a from t"])
        assert out["exact"]["all"] == 0.0


class TestMetricClass:
    def test_sql_match_acc_metric(self):
        import ofasys_tpu.metric  # noqa: F401  (registers the metric zoo)
        from ofasys_tpu.configure import ConfigStore

        node = ConfigStore().get("ofasys.metric", "sql_match_acc")
        metric = node.target_cls()
        res = metric.compute(
            ["farm | select name from cows", "farm | select id from cows"],
            ["farm | select name from cows", "farm | select name from cows"],
        )
        assert res["sql_match_acc"] == pytest.approx(0.5)
        assert 0.0 <= res["sql_partial_f1"] <= 1.0


class TestBridgeLinking:
    @pytest.fixture()
    def db(self, tmp_path):
        path = str(tmp_path / "farm.sqlite")
        conn = sqlite3.connect(path)
        conn.execute("create table cows (id integer, name text, breed text)")
        conn.executemany(
            "insert into cows values (?,?,?)",
            [(1, "bessie", "holstein"), (2, "daisy", "jersey")],
        )
        conn.commit()
        conn.close()
        return path

    def test_question_value_linked(self, db):
        from ofasys_tpu.utils.spider_linking import get_database_matches

        assert get_database_matches(
            "what is the id of bessie?", "cows", "name", db) == ["bessie"]

    def test_no_link_for_unrelated(self, db):
        from ofasys_tpu.utils.spider_linking import get_database_matches

        assert get_database_matches(
            "how many entries are there?", "cows", "name", db) == []

    def test_numeric_column_skipped(self, db):
        from ofasys_tpu.utils.spider_linking import get_database_matches

        assert get_database_matches(
            "what about cow 1?", "cows", "id", db) == []

    def test_serialize_schema_with_content(self, db):
        from ofasys_tpu.utils.spider_linking import serialize_schema

        s = serialize_schema(
            question="show the breed of the cow named daisy",
            db_path=db,
            db_id="farm",
            tables=[("cows", ["id", "name", "breed"])],
        )
        assert s.startswith(" | farm | cows :")
        assert "name ( daisy )" in s

    def test_serialize_schema_without_content(self):
        from ofasys_tpu.utils.spider_linking import serialize_schema

        s = serialize_schema(
            question="", db_path="", db_id="farm",
            tables=[("cows", ["id", "name"])], with_db_content=False,
        )
        assert s == " | farm | cows : id , name"

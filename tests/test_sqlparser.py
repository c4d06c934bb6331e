"""Parser unit tests: grammar acceptance, feature extraction, rendering.

Feature semantics mirror the reference's regex extractor
(reference ml_optimizer.py:65-113) but over a real parse.
"""

import pytest

from approximate_query_engine_spark.sqlparser import (
    ParseError,
    UnsupportedQueryError,
    parse,
    try_parse,
)


def test_simple_count():
    q = parse("SELECT COUNT(*) FROM purchases")
    assert q.table == "purchases"
    assert q.has_count and not q.has_sum
    assert q.aggregates[0].is_star
    assert not q.has_group_by


def test_count_sum_avg_aliases():
    q = parse(
        "SELECT COUNT(*) AS cnt, SUM(amount) AS total, AVG(amount) FROM purchases"
    )
    assert [a.func for a in q.aggregates] == ["COUNT", "SUM", "AVG"]
    assert q.select_items[0].output_name == "cnt"
    assert q.select_items[2].output_name == "AVG(amount)"


def test_group_by_where_having_order_limit():
    q = parse(
        "SELECT country, COUNT(*) FROM purchases WHERE amount > 500 AND country <> 'UK' "
        "GROUP BY country HAVING COUNT(*) > 10 ORDER BY 2 DESC LIMIT 5"
    )
    assert q.group_by == ["country"]
    assert q.where_complexity == 1
    assert q.having == "COUNT(*) > 10"
    assert q.order_by[0].desc and q.order_by[0].expr == "2"
    assert q.limit == 5


def test_distinct_detection():
    q = parse("SELECT COUNT(DISTINCT customer_id) FROM purchases")
    assert q.has_distinct and q.has_count


def test_min_max():
    q = parse("SELECT MIN(amount), MAX(amount) FROM purchases")
    assert q.has_min_max and not q.has_count


def test_expression_not_mistaken_for_agg():
    q = parse("SELECT SUM(a) + SUM(b) AS both FROM t")
    # composite expression: not a single top-level aggregate
    assert q.select_items[0].agg is None


def test_unsupported_join():
    with pytest.raises(UnsupportedQueryError):
        parse("SELECT * FROM a JOIN b ON a.x = b.x")
    assert try_parse("SELECT * FROM a JOIN b ON a.x = b.x") is None


def test_unsupported_subquery_union_cte_window():
    for sql in [
        "SELECT * FROM (SELECT 1)",
        "SELECT a FROM t UNION SELECT a FROM u",
        "WITH x AS (SELECT 1) SELECT * FROM x",
        "SELECT RANK() OVER (ORDER BY a) FROM t",
        "SELECT * FROM a, b",
    ]:
        with pytest.raises(ParseError):
            parse(sql)


def test_string_literal_with_keyword():
    q = parse("SELECT COUNT(*) FROM t WHERE name = 'JOIN me'")
    assert q.where == "name = 'JOIN me'"


def test_render_roundtrip_and_overrides():
    q = parse("SELECT country, COUNT(*) AS c FROM purchases GROUP BY country")
    assert (
        q.render() == "SELECT country, COUNT(*) AS c FROM purchases GROUP BY country"
    )
    assert "FROM s" in q.render(table_override="s")
    out = q.render(extra_where="x < 3")
    assert "WHERE x < 3" in out


def test_from_alias():
    for sql in (
        "SELECT COUNT(*) FROM lineitem l",
        "SELECT COUNT(*) FROM lineitem AS l",
    ):
        q = parse(sql)
        assert q.table == "lineitem" and q.table_alias == "l"
    q = parse("SELECT l.country, COUNT(l.id) AS c FROM purchases AS l GROUP BY l.country")
    assert q.table == "purchases"
    # alias survives table substitution so qualified refs keep resolving
    out = q.render(table_override="purchases__sample_0_01")
    assert "FROM purchases__sample_0_01 l" in out


def test_from_alias_rejects_garbage():
    with pytest.raises(ParseError):
        parse("SELECT 1 FROM t a b")
    with pytest.raises(ParseError):
        parse("SELECT COUNT(*) FROM lineitem AS")  # dangling AS is not an alias


def test_comments_and_semicolon():
    q = parse("SELECT COUNT(*) FROM t; -- trailing\n")
    assert q.table == "t"

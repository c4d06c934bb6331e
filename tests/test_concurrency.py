"""Concurrent engine usage: the HTTP service serves threaded requests over
one shared SparkSession — parallel queries must not interfere."""

from concurrent.futures import ThreadPoolExecutor


def test_concurrent_mixed_queries(engine):
    sqls = [
        "SELECT COUNT(*) AS c FROM lineitem",
        "SELECT l_returnflag, SUM(l_quantity) AS s FROM lineitem GROUP BY l_returnflag",
        "SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem",
        "SELECT AVG(l_extendedprice) AS a FROM lineitem WHERE l_quantity > 10",
        "SELECT o_orderstatus, COUNT(*) AS c FROM orders GROUP BY o_orderstatus",
        "SELECT MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi FROM lineitem",
    ] * 3

    def run(sql):
        return engine.query(sql, max_rel_error=0.2, use_ml_optimization=True)

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(run, sqls))
    assert all(r["status"] == "ok" for r in results), [
        r.get("error") for r in results if r["status"] != "ok"
    ]
    # determinism across duplicate queries within the run (seeded sampling)
    by_sql = {}
    for sql, r in zip(sqls, results):
        key = tuple(sorted(map(str, (tuple(sorted(row.items())) for row in r["result"]))))
        by_sql.setdefault(sql, set()).add(key)
    for sql, variants in by_sql.items():
        assert len(variants) == 1, f"nondeterministic concurrent results for {sql}"

"""Driver-contract registry integrity: the correctness gate hashes the
FIRST 50 rows of queries(), so silent dict-literal mistakes (duplicate
keys collapse at runtime; a first-50 row without an oracle only gets the
weak rows-only check) must fail loudly here instead of in the round
artifact."""

import ast


def _query_literal_keys():
    src = open("grower_spark/driver_queries.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "QUERIES":
            return [ast.literal_eval(k) for k in node.value.keys]
    raise AssertionError("QUERIES dict literal not found")


def test_no_duplicate_registry_keys():
    """Runtime dicts silently dedupe — the AST is the only place a
    duplicated row is visible (r9: a window reshuffle briefly listed
    events_sessionize twice; 113 literal entries, 112 runtime keys)."""
    keys = _query_literal_keys()
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate QUERIES keys: {dupes}"


def test_first_50_rows_all_have_oracles():
    from grower_spark.driver_queries import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    missing = [k for k in window if k not in ORACLES]
    assert not missing, f"first-50 rows without oracle SQL: {missing}"


def test_entry_module_exports_match():
    """__spark_entry__ must re-export the full registry: every queries()
    key callable, every oracle_sql() key present in queries()."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert all(callable(v) for v in q.values())
    assert set(o) <= set(q), sorted(set(o) - set(q))[:5]


def test_bench_queries_exist_in_registry():
    import bench

    from grower_spark.driver_queries import QUERIES

    unknown = [n for n, _ in bench.BENCH_QUERIES if n not in QUERIES]
    assert not unknown, unknown

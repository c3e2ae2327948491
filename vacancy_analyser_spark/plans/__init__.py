from .registry import all_specs, oracle_sql, queries, register

__all__ = ["all_specs", "oracle_sql", "queries", "register"]

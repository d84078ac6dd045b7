from .queries import QUERIES
from .oracle import ORACLE_SQL

__all__ = ["QUERIES", "ORACLE_SQL"]

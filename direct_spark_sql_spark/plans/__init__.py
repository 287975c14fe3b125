"""Query-plan package.  ``QUERIES`` / ``Query`` / ``all_queries`` are
re-exported lazily (PEP 562) rather than at package-import time.

Eager re-export was a latent import-cycle trigger: ANY
``direct_spark_sql_spark.plans.X`` import first runs this ``__init__``,
and building the registry imports ``plans.streaming``, which imports
``direct_spark_sql_spark.streaming``.  If the registry build fired while
that package was itself mid-initialization (e.g. user code imports
``direct_spark_sql_spark.streaming`` FIRST, whose ``pipelines`` module
imports ``plans.base``), the circular import raised ImportError inside
the registry's optional-module guard and the 16 streaming queries
silently vanished from ``QUERIES`` (313 → 297) for the life of the
process.  Deferring the registry build until someone actually asks for
``QUERIES``/``all_queries`` breaks the cycle: by then every package is
fully initialized.  (Found round 13 by the streaming hostile-axis run;
regression test: tests/test_import_order.py.)
"""

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # static type-checkers see the real symbols
    from direct_spark_sql_spark.plans.registry import (  # noqa: F401
        QUERIES,
        Query,
        all_queries,
    )

__all__ = ["QUERIES", "Query", "all_queries"]


def __getattr__(name: str):
    if name in __all__:
        from direct_spark_sql_spark.plans import registry

        return getattr(registry, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

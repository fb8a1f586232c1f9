"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``     — flagship extraction pipeline on a deterministic
                    synthetic transcript corpus (sf0.001-scale) plus the
                    sf0.001 testdata; returns the extracted Dataset.
* ``queries()``   — one entry per implemented operator/pipeline
                    (SURVEY.md §2 + training-data ops).
* ``oracle_sql()``— DuckDB-equivalent SQL for the SQL-expressible subset,
                    with IDENTICAL column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; driver checks rows >= 0."""
    from ocr_processor_ray.queries_catalog import q_flagship_extract

    return q_flagship_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_processor_ray.queries_catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_processor_ray.queries_catalog import ORACLE_SQL, ensure_oracle_inputs

    # the flagship oracle rows read a fixed deterministic corpus parquet by
    # absolute path — materialize it before either comparison side runs
    ensure_oracle_inputs()
    return dict(ORACLE_SQL)

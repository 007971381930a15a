"""Driver contract for the rayenc engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing below
calls ray.init()/ray.shutdown() (see rayenc/__init__.py docstring).

- entry(): flagship encode->verify->decode over sf0.001 documents.
- queries(): one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data stages).
- oracle_sql(): DuckDB equivalents for the SQL-expressible subset;
  approximate/heuristic ops (minhash/simhash/LSH/fingerprints/quality)
  are deliberately rows-only.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from rayenc.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from rayenc.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from rayenc.pipelines.queries import ORACLES

    return dict(ORACLES)

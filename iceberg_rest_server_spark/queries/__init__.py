"""Declared query inventory (SURVEY.md §2F) — importing this package
registers every query in REGISTRY."""

from __future__ import annotations

from ._registry import REGISTRY, Query, oracle_sql, queries
from . import core  # noqa: F401  (Q01–Q06)
from . import joins  # noqa: F401  (Q07–Q14)
from . import windows  # noqa: F401  (Q15–Q18)
from . import setops  # noqa: F401  (Q19)
from . import functions  # noqa: F401  (Q20–Q24)
from . import sql_queries  # noqa: F401  (Q25–Q26)
from . import udfs  # noqa: F401  (Q27–Q28)
from ..streaming import queries as _streaming_queries  # noqa: F401  (Q29–Q30)
from . import northstar  # noqa: F401  (Q31+ training-data pipeline ops)
from . import catalog_e2e  # noqa: F401  (Q34 catalog plane)
from . import stats  # noqa: F401  (Q41+ statistics)
from . import mixing  # noqa: F401  (Q43–Q48 corpus hygiene / data mixing)
from . import tpch  # noqa: F401  (Q63–Q77 TPC-H-adapted suite)
from . import packing  # noqa: F401  (Q78–Q81 training-data export ops)
from . import sources  # noqa: F401  (Q117 source/sink format round-trips)
from . import advanced  # noqa: F401  (Q127–Q133 round-5 tier)
from . import corpus  # noqa: F401  (Q146–Q148 corpus modeling tier)
from . import curation  # noqa: F401  (Q151–Q152 corpus-curation QA tier)
from . import pipeline  # noqa: F401  (Q155–Q159 pipeline-hygiene / engine-stats tier)
from . import mleval  # noqa: F401  (Q163–Q170 model-eval / advanced-analytics tier)
from . import warehouse  # noqa: F401  (Q189–Q198 warehouse-ops / data-quality tier)

__all__ = ["REGISTRY", "Query", "queries", "oracle_sql"]

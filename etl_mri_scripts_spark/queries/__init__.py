"""Query registry: every operator from SURVEY.md §2 declared as a named
query (Spark callable) with, where SQL-expressible, a DuckDB oracle.

Import side effects register queries; keep module list here exhaustive.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects. Registration order matters: the
# round driver oracle-checks queries in registry order with a per-round cap,
# so modules without driver CORRECTNESS rows yet go first (round 1 verified
# exactly the relational block; it now registers last).
from . import windows  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import imaging  # noqa: E402,F401
from . import bpe  # noqa: E402,F401
from . import formats  # noqa: E402,F401
from . import quality  # noqa: E402,F401
from . import sampling  # noqa: E402,F401
from . import curation  # noqa: E402,F401
from . import tpch_shapes  # noqa: E402,F401
from . import pipeline_analytics  # noqa: E402,F401
from . import relational  # noqa: E402,F401

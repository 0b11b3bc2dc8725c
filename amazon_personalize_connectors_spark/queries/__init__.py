"""Query builders split out of __spark_entry__.py (r9): verbatim
moves, same names, same behavior — the entry file star-imports
this package to keep the driver contract stable."""

from amazon_personalize_connectors_spark.queries._shared import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q01 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q02 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q03 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q04 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q05 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q06 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries.q07 import *  # noqa: F401,F403
from amazon_personalize_connectors_spark.queries._sqlcte import *  # noqa: F401,F403


# __all__ is the union of the submodules' exports, computed at import
# time so adding a query to a chunk (and its chunk __all__) is enough —
# no second registration point here to forget.
from amazon_personalize_connectors_spark.queries import (  # noqa: E402
    _shared as _m_shared,
    _sqlcte as _m_sqlcte,
    q01 as _m_q01,
    q02 as _m_q02,
    q03 as _m_q03,
    q04 as _m_q04,
    q05 as _m_q05,
    q06 as _m_q06,
    q07 as _m_q07,
)

__all__ = list(dict.fromkeys(
    n
    for m in (_m_shared, _m_q01, _m_q02, _m_q03, _m_q04, _m_q05, _m_q06, _m_q07, _m_sqlcte)
    for n in m.__all__
))

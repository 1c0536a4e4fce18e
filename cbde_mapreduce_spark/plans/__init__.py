"""Query plans: importing this package populates the registry.

Each submodule covers one SURVEY.md §2 block; adding a module here is the
single step needed for its queries to appear in ``__spark_entry__.queries()``
and the driver's correctness gate.
"""

from cbde_mapreduce_spark.plans.registry import REGISTRY, QuerySpec, query  # noqa: F401

# Import order = SURVEY.md §7 build-plan order. Each import registers queries.
from cbde_mapreduce_spark.plans import tpch  # noqa: F401,E402
from cbde_mapreduce_spark.plans import tpch_more  # noqa: F401,E402
from cbde_mapreduce_spark.plans import tpch_rest  # noqa: F401,E402
from cbde_mapreduce_spark.plans import relational  # noqa: F401,E402
from cbde_mapreduce_spark.plans import aggregates  # noqa: F401,E402
from cbde_mapreduce_spark.plans import setops  # noqa: F401,E402
from cbde_mapreduce_spark.plans import joins  # noqa: F401,E402
from cbde_mapreduce_spark.plans import windows  # noqa: F401,E402
from cbde_mapreduce_spark.plans import events_q  # noqa: F401,E402
from cbde_mapreduce_spark.plans import text  # noqa: F401,E402
from cbde_mapreduce_spark.plans import neardup  # noqa: F401,E402
from cbde_mapreduce_spark.plans import similarity_q  # noqa: F401,E402
from cbde_mapreduce_spark.plans import multimodal_q  # noqa: F401,E402
from cbde_mapreduce_spark.plans import udfs  # noqa: F401,E402
from cbde_mapreduce_spark.plans import streaming_q  # noqa: F401,E402
from cbde_mapreduce_spark.plans import extras  # noqa: F401,E402
from cbde_mapreduce_spark.plans import scale_ops  # noqa: F401,E402
from cbde_mapreduce_spark.plans import llm_pipeline  # noqa: F401,E402
from cbde_mapreduce_spark.plans import graph_q  # noqa: F401,E402
from cbde_mapreduce_spark.plans import event_analytics  # noqa: F401,E402
from cbde_mapreduce_spark.plans import agg_ext  # noqa: F401,E402
from cbde_mapreduce_spark.plans import clean_ext  # noqa: F401,E402
from cbde_mapreduce_spark.plans import timeseries  # noqa: F401,E402
from cbde_mapreduce_spark.plans import mlprep  # noqa: F401,E402
from cbde_mapreduce_spark.plans import retrieval  # noqa: F401,E402
from cbde_mapreduce_spark.plans import stats_models  # noqa: F401,E402
from cbde_mapreduce_spark.plans import recsys  # noqa: F401,E402
from cbde_mapreduce_spark.plans import privacy  # noqa: F401,E402

"""Aggregates the per-domain query modules into the driver-facing registry."""

from rca_data_tools_spark.queries._registry import ORACLES, QUERIES  # noqa: F401

# Importing registers the queries.
from rca_data_tools_spark.queries import core  # noqa: F401, E402
from rca_data_tools_spark.queries import qcq  # noqa: F401, E402
from rca_data_tools_spark.queries import dedupq  # noqa: F401, E402
from rca_data_tools_spark.queries import windowq  # noqa: F401, E402
from rca_data_tools_spark.queries import joinq  # noqa: F401, E402
from rca_data_tools_spark.queries import textq  # noqa: F401, E402
from rca_data_tools_spark.queries import vecq  # noqa: F401, E402
from rca_data_tools_spark.queries import multimodalq  # noqa: F401, E402
from rca_data_tools_spark.queries import calcq  # noqa: F401, E402
from rca_data_tools_spark.queries import instrq  # noqa: F401, E402
from rca_data_tools_spark.queries import sampleq  # noqa: F401, E402
from rca_data_tools_spark.queries import relq  # noqa: F401, E402
from rca_data_tools_spark.queries import frameq  # noqa: F401, E402
from rca_data_tools_spark.queries import bpeq  # noqa: F401, E402
from rca_data_tools_spark.queries import retrq  # noqa: F401, E402
from rca_data_tools_spark.queries import sketchq  # noqa: F401, E402
from rca_data_tools_spark.queries import lifecycleq  # noqa: F401, E402
from rca_data_tools_spark.queries import mlq  # noqa: F401, E402

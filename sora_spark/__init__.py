"""sora_spark — a PySpark-native analytics engine with the capability
surface of BioHPC/SORA (overlap-graph reduction on Spark) plus the
LLM-data-pipeline extensions (dedup, similarity search, multimodal
columns, text analysis).

Built Spark-first: the DataFrame/SQL API declares logical plans and
Catalyst/Tungsten/AQE pick the physical strategy (SURVEY.md §4.1).
Custom code concentrates where Spark has no built-in: iterative graph
fixpoints (sora_spark.graph), the LLM-op library (sora_spark.llm), and
the correctness harness (tests/).

NOTE on provenance: the designated reference checkout /root/reference
is EMPTY (SURVEY.md §0.1), so no file:line citations into it are
possible. Capability parity is defined by SURVEY.md §2, which is
grounded in the driver's BASELINE.json / TESTDATA.md and public
knowledge of the SORA paper (overlap-graph reduction for genome
assembly using Apache Spark, BioHPC lab).
"""

from sora_spark.session import build_session, prepare_session
from sora_spark.catalog import Tables, TABLE_NAMES
from sora_spark.engine import Engine

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "build_session",
    "prepare_session",
    "Tables",
    "TABLE_NAMES",
    "__version__",
]

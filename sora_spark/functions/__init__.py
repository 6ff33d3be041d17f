"""Column-expression library: vector math, text shingling/hashing.

Everything here returns Column expressions built from
pyspark.sql.functions — JVM-side, inside whole-stage codegen; no
Python UDFs in these hot paths (SURVEY §4.1).
"""

from sora_spark.functions import vector, text  # noqa: F401

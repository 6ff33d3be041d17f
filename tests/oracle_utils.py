"""Cross-engine comparison harness (SURVEY §2.0 protocol).

Both results are canonicalized cell-by-cell to strings (None → \\N,
floats via repr(float), timestamps → 'YYYY-MM-DD HH:MM:SS.ffffff'),
columns sorted by name, rows sorted — i.e. an order-insensitive value
comparison, mirroring the driver's value-hash check but with readable
diffs on mismatch.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None:
        return "\\N"
    if isinstance(v, float) and math.isnan(v):
        return "\\N"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "\\N"
        return v.to_pydatetime().strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, np.ndarray)):
        return json.dumps([_canon_cell(x) for x in list(v)])
    if isinstance(v, dict):
        return json.dumps({k: _canon_cell(x) for k, x in sorted(v.items())})
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    # Column-wise extraction: row-wise iloc would upcast int columns to
    # float when the row mixes dtypes.
    cols = sorted(pdf.columns)
    col_vals = [[_canon_cell(v) for v in pdf[c].tolist()] for c in cols]
    return sorted(zip(*col_vals)) if col_vals and col_vals[0] else []


def _dtype_class(dtype) -> str:
    kind = getattr(dtype, "kind", "O")
    return {
        "i": "int", "u": "int", "f": "float", "b": "bool",
        "M": "datetime", "O": "object",
    }.get(kind, "object")


def compare(spark_df, duck_con, oracle: str, name: str = "") -> None:
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_con.execute(oracle).fetchdf()
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    # coarse schema check mirroring the driver's: same dtype class per
    # column (int-width drift DuckDB↔Spark should be caught here, not
    # by the value hash)
    for c in s_cols:
        sc, dc = _dtype_class(spark_pdf[c].dtype), _dtype_class(duck_pdf[c].dtype)
        assert sc == dc, (
            f"{name}: dtype class mismatch on {c}: spark={spark_pdf[c].dtype} "
            f"duck={duck_pdf[c].dtype}"
        )
    s_rows, d_rows = canon_rows(spark_pdf), canon_rows(duck_pdf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count mismatch spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch (cols={s_cols}); first diffs (spark vs duck): "
            + "; ".join(f"row {i}: {a} != {b}" for i, a, b in diffs)
        )

"""Dataset schema probing that works across Ray block formats."""

from __future__ import annotations

import pyarrow as pa


def pa_col_type(ds, col: str) -> pa.DataType:
    """Arrow type of ``col`` — handles both arrow-block schemas and
    pandas-block schemas (whose ``types`` may be numpy dtypes OR arrow
    DataTypes depending on Ray version)."""
    sch = ds.schema()
    try:
        return sch.base_schema.field(col).type
    except AttributeError:
        dt = dict(zip(sch.names, sch.types))[col]
        if isinstance(dt, pa.DataType):
            return dt
        import numpy as np

        dt = np.dtype(dt)  # normalize (plain `object` class appears too)
        if dt.kind in ("O", "U", "S"):  # object / unicode / bytes → string
            return pa.string()
        return pa.from_numpy_dtype(dt)

"""Driver-faithful result comparison shared by the local gates
(`scripts/verify_vanilla.py`, `tests/test_oracle.py`).

The external driver hashes result VALUES byte-wise after sorting
columns by name — so two results can be equal under ``==`` yet hash
differently.  Two such classes have shipped blind through value-level
comparison:

* round 2: DuckDB HUGEINT aggregates surface as float64, so ``3.0``
  hashes unlike Spark's ``3`` (int/float dtype-kind split);
* round 3: DuckDB ``round()`` preserves ``-0.0`` where Spark's
  normalizes to ``+0.0`` — ``-0.0 == 0.0`` is true, so
  ``assert_frame_equal(check_exact=True)`` passes while the 8-byte
  float hash differs (``x17b_geometry_accessors``).

``strict_mismatch`` therefore compares float columns as raw IEEE-754
bytes (after the canonical row sort), which also catches NaN-payload
and any future representation-level divergence, retiring the whole
category rather than the symptom of the round.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name sort + us-timestamp + stringified objects + stable
    row sort — the driver's canonical form."""
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(lambda v: None if v is None else str(v))
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort") \
               .reset_index(drop=True)
    return df


def strict_mismatch(got: pd.DataFrame, want: pd.DataFrame) -> Optional[str]:
    """Compare two UNcanonicalized frames the way the driver hashes
    them.  Returns a human-readable reason on mismatch, None on match.

    Checks, in driver order:
      1. row count;
      2. column-name set;
      3. int-vs-float dtype-kind split (HUGEINT rule, round 2);
      4. float columns: byte-equality of the float64 IEEE-754
         representation after canonical row sort (signed zero, NaN
         payload — round 3);
      5. everything else: ``assert_frame_equal(check_exact=True)``.
    """
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return (f"column mismatch: {sorted(got.columns)} != "
                f"{sorted(want.columns)}")
    kind_splits = [
        c for c in got.columns
        if {got[c].dtype.kind, want[c].dtype.kind} in ({"i", "f"}, {"u", "f"})
    ]
    if kind_splits:
        return ("int/float dtype split (driver hash would differ): "
                f"{kind_splits} — CAST the DuckDB aggregate to BIGINT "
                "or align the Spark column type")
    g, w = canonicalize(got), canonicalize(want)
    for c in g.columns:
        if g[c].dtype.kind == "f" and w[c].dtype.kind == "f":
            a = np.ascontiguousarray(g[c].to_numpy(dtype="float64"))
            b = np.ascontiguousarray(w[c].to_numpy(dtype="float64"))
            if a.tobytes() != b.tobytes():
                diff = a.view("uint64") != b.view("uint64")
                idx = np.flatnonzero(diff)[:3]
                samples = [
                    f"row {int(i)}: spark={a[i]!r}"
                    f"{' (-0.0)' if np.signbit(a[i]) and a[i] == 0 else ''}"
                    f" vs oracle={b[i]!r}"
                    f"{' (-0.0)' if np.signbit(b[i]) and b[i] == 0 else ''}"
                    for i in idx
                ]
                return (f"float byte mismatch in '{c}' "
                        f"({int(diff.sum())}/{len(a)} rows; driver hashes "
                        f"IEEE bytes, so -0.0 != +0.0 and NaN payloads "
                        f"matter): {'; '.join(samples)}")
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)
    except AssertionError as exc:
        return str(exc).splitlines()[0][:200]
    return None

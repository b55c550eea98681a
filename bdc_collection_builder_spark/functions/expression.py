"""Band-expression engine.

The reference evaluates user-supplied band expressions (e.g.
``NDVI = (B08 - B04) / (B08 + B04)``) by ``ast.parse`` + ``exec`` over
numpy arrays, one block window at a time (reference
``bdc_collection_builder/celery/tasks/index_generator.py:99-141`` driving
``bdc_collection_builder/interpreter.py:28-58``) — with an acknowledged
sandboxing TODO (interpreter.py:35).

Here the expression compiles to a **Catalyst expression** over a
band-wide pixel DataFrame: ``F.expr`` gives whole-stage-codegen'd,
JVM-side evaluation at any scale, and a strict AST validator closes the
sandbox gap (only band identifiers, numeric literals, arithmetic, and a
small math whitelist are admitted — no attribute access, no calls
outside the whitelist, no dunder tricks).

Output handling mirrors the reference (index_generator.py:107-136):
the result is clamped to the target dtype's [min, max] and masked
(NULL / nodata) pixels are filled with the band's nodata value.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

ALLOWED_FUNCS = {"sqrt", "abs", "least", "greatest", "pow", "log", "exp"}

DTYPE_RANGES = {
    "uint8": (0, 255),
    "int16": (-32768, 32767),
    "uint16": (0, 65535),
    "int32": (-2147483648, 2147483647),
    "uint32": (0, 4294967295),
    "float32": (float("-inf"), float("inf")),
}


class BandExpressionError(ValueError):
    """Raised when a band expression fails validation."""


def parse_expression(expression: str) -> tuple[str, str]:
    """Split ``'NAME = <expr>'`` into (name, expr); bare exprs allowed."""
    if "=" in expression:
        name, _, body = expression.partition("=")
        return name.strip(), body.strip()
    return "", expression.strip()


def validate_expression(expression: str, allowed_bands: set[str] | frozenset[str]) -> str:
    """Validate a band expression against the band catalog.

    Returns the expression body. Raises :class:`BandExpressionError` on
    any identifier that is not a known band, any call not in the math
    whitelist, or any non-arithmetic syntax. This replaces the
    reference's unsandboxed ``exec`` (interpreter.py:35 TODO).
    """
    _, body = parse_expression(expression)
    try:
        tree = ast.parse(body, mode="eval")
    except SyntaxError as exc:
        raise BandExpressionError(f"unparseable expression: {body!r}") from exc

    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            if node.id not in allowed_bands and node.id.lower() not in ALLOWED_FUNCS:
                raise BandExpressionError(f"unknown band {node.id!r}")
        elif isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id.lower() not in ALLOWED_FUNCS:
                raise BandExpressionError("only whitelisted math functions allowed")
        elif isinstance(node, ast.Attribute):
            raise BandExpressionError("attribute access not allowed")
        elif isinstance(
            node,
            (
                ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.Load,
                ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow, ast.Mod,
                ast.USub, ast.UAdd, ast.Compare, ast.Lt, ast.LtE, ast.Gt,
                ast.GtE, ast.Eq, ast.NotEq, ast.IfExp, ast.keyword,
            ),
        ):
            continue
        else:
            raise BandExpressionError(
                f"disallowed syntax {type(node).__name__} in band expression"
            )
    return body


_CMP_OPS = {
    ast.Lt: "<", ast.LtE: "<=", ast.Gt: ">", ast.GtE: ">=",
    ast.Eq: "=", ast.NotEq: "<>",
}
_BIN_OPS = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Mod: "%"}


def _emit_sql(node: ast.AST) -> str:
    """Emit ANSI-safe Spark SQL from a validated expression AST.

    Division becomes ``try_divide`` so 0/0 yields NULL (→ nodata after
    coalesce) instead of an ANSI runtime error — this matches the
    reference's numpy masked-array behavior where a zero denominator
    produces a masked pixel filled with nodata
    (index_generator.py:107-136).
    """
    if isinstance(node, ast.Expression):
        return _emit_sql(node.body)
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Constant):
        # Float literals must carry the D suffix: Spark SQL parses a bare
        # `2.0` as DECIMAL(2,1), and decimal division truncates to 6
        # fractional digits — diverging from the reference's float64
        # numpy arithmetic (interpreter.py:28-58). `2.0D` is a DOUBLE.
        if isinstance(node.value, float):
            return f"{node.value!r}D"
        return repr(node.value)
    if isinstance(node, ast.UnaryOp):
        sign = "-" if isinstance(node.op, ast.USub) else "+"
        return f"({sign}{_emit_sql(node.operand)})"
    if isinstance(node, ast.BinOp):
        left, right = _emit_sql(node.left), _emit_sql(node.right)
        if isinstance(node.op, ast.Div):
            return f"try_divide({left}, {right})"
        if isinstance(node.op, ast.Pow):
            return f"power({left}, {right})"
        return f"({left} {_BIN_OPS[type(node.op)]} {right})"
    if isinstance(node, ast.Compare):
        left = _emit_sql(node.left)
        parts = [
            f"{left} {_CMP_OPS[type(op)]} {_emit_sql(cmp)}"
            for op, cmp in zip(node.ops, node.comparators)
        ]
        return "(" + " AND ".join(parts) + ")"
    if isinstance(node, ast.IfExp):
        return (
            f"(CASE WHEN {_emit_sql(node.test)} THEN {_emit_sql(node.body)}"
            f" ELSE {_emit_sql(node.orelse)} END)"
        )
    if isinstance(node, ast.Call):
        args = ", ".join(_emit_sql(a) for a in node.args)
        return f"{node.func.id.lower()}({args})"
    raise BandExpressionError(f"cannot emit {type(node).__name__}")


def compile_band_expression(
    expression: str,
    allowed_bands: set[str] | frozenset[str],
    dtype: str = "int16",
    nodata: float | None = None,
    scale: float | None = None,
) -> Column:
    """Compile a validated band expression to a Catalyst Column.

    The returned column computes the expression over same-named band
    columns of a wide pixel DataFrame, optionally scales it, clamps it
    to the dtype range (index_generator.py:107-136 semantics), and fills
    NULL (masked) pixels with ``nodata``.
    """
    body = validate_expression(expression, allowed_bands)
    col = F.expr(_emit_sql(ast.parse(body, mode="eval")))
    if scale is not None:
        col = col * F.lit(scale)
    lo, hi = DTYPE_RANGES.get(dtype, DTYPE_RANGES["float32"])
    if lo != float("-inf"):
        # least/greatest skip NULL args, which would turn a masked pixel
        # into the dtype bound — clamp only non-NULL values so masked
        # pixels fall through to the nodata fill.
        clamped = F.greatest(F.least(col, F.lit(float(hi))), F.lit(float(lo)))
        col = F.when(col.isNotNull(), clamped)
    if nodata is not None:
        col = F.coalesce(col, F.lit(float(nodata)))
    return col

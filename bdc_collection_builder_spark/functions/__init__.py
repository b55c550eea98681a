"""Scalar functions, band-expression compiler, and pixel kernels."""

from bdc_collection_builder_spark.functions.expression import (
    BandExpressionError,
    compile_band_expression,
    validate_expression,
)

__all__ = ["BandExpressionError", "compile_band_expression", "validate_expression"]

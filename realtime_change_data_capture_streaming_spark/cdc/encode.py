"""Encode DECIMAL values into the three Debezium wire shapes.

Used by test fixtures / the synthetic event generator so the decoder in
:mod:`realtime_change_data_capture_streaming_spark.cdc.decode` can be exercised against all of
``decimal.handling.mode`` = precise | string | double
(``/root/reference/README.md:342-347``).

precise mode is Debezium's default: the unscaled value as big-endian
two's-complement bytes, base64-encoded, plus a scale
(``/root/reference/README.md:270-274``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from realtime_change_data_capture_streaming_spark.schemas import AMOUNT_TYPE


def _unscaled(amount: Column) -> Column:
    """Unscaled long for scale=2: 459.38 -> 45938."""
    return F.round(amount.cast("double") * 100.0, 0).cast("long")


def _twos_complement_hex(v: Column) -> Column:
    """Minimal big-endian two's-complement byte string (hex) for a long.

    Java's BigInteger.toByteArray() semantics: smallest byte array whose
    top bit is the sign.  We compute it with conditional hex-trimming —
    pure column expressions, no UDF.
    """
    # 16 hex chars = full 64-bit two's complement representation
    full = F.lpad(F.hex(v), 16, F.when(v < 0, F.lit("f")).otherwise(F.lit("0")))
    # Trim redundant leading bytes: "00" before a byte <0x80, "ff" before >=0x80.
    trimmed = F.regexp_replace(full, r"^(?:00)+(?=[0-7])", "")
    trimmed = F.regexp_replace(trimmed, r"^(?:ff)+(?=[89a-f])", "")
    return trimmed


def encode_amount(amount: Column, decimal_mode: str) -> Column:
    """amount (decimal) -> wire-shape column for the given mode."""
    amount = amount.cast(AMOUNT_TYPE)
    if decimal_mode == "double":
        return amount.cast("double")
    if decimal_mode == "string":
        return amount.cast("string")
    if decimal_mode == "precise":
        return F.struct(
            F.lit(2).alias("scale"),
            F.base64(F.to_binary(_twos_complement_hex(_unscaled(amount)), F.lit("hex"))).alias("value"),
        )
    raise ValueError(f"unknown decimal_mode {decimal_mode!r}")

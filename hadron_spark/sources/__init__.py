"""Sources & sinks: Taps (typed dataset bindings, SURVEY §2.1 S1-S6),
format/protocol registry (§2.2 P1-P11), and the fan-out sink (§2.1
S7-S9)."""

from hadron_spark.sources.fanout import fan_out_by, fan_out_write, partitioned_write
from hadron_spark.sources.taps import (
    PROTOCOL_FORMATS,
    Tap,
    binary_dir_tap,
    concat_taps,
    file_list_tap,
    merge_taps,
    read_tap,
    tap,
    taps,
)

__all__ = [
    "PROTOCOL_FORMATS",
    "Tap",
    "tap",
    "taps",
    "concat_taps",
    "merge_taps",
    "binary_dir_tap",
    "file_list_tap",
    "read_tap",
    "fan_out_write",
    "fan_out_by",
    "partitioned_write",
]

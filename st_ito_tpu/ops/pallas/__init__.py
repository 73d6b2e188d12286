"""Pallas TPU kernels for the sequential hot ops."""

from st_ito_tpu.ops.pallas.scan import (
    ballistics_pallas,
    linear_recurrence_pallas,
    pallas_scan_available,
)

__all__ = [
    "ballistics_pallas",
    "linear_recurrence_pallas",
    "pallas_scan_available",
]

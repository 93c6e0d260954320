"""Pallas TPU kernels for the dense stencil hot paths.

XLA fuses the pipeline's elementwise math well, but the stripe tracker's
windowed ops materialize ~20 full-image intermediates in HBM; the Pallas
versions keep the whole chain (box-sum -> extrema scan -> sub-pixel
refine) in VMEM, one HBM read of the uint8 frame and one write of the
two offset maps per tile.

Import is lazy-safe: modules import on any backend; kernels run on TPU
(or anywhere under ``interpret=True``).
"""

from slc_tpu.pallas.stripe import stripe_regression_pallas

__all__ = ["stripe_regression_pallas"]

"""Hand-fused TPU kernels (Pallas) for the hot dense-pair passes."""

from .pallas_pair import (
    PALLAS_OK,
    hoist_fb_pallas,
    hoist_ff_pallas,
    k_pass_pallas,
    t_pass_pallas,
)

__all__ = [
    "t_pass_pallas",
    "k_pass_pallas",
    "hoist_ff_pallas",
    "hoist_fb_pallas",
    "PALLAS_OK",
]

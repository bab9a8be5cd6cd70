from tobac_flow_tpu.ops.warp import warp_flow, warp_plane, shift_plane  # noqa: F401
from tobac_flow_tpu.ops.convolve import convolve, structure_taps  # noqa: F401
from tobac_flow_tpu.ops.sobel import sobel  # noqa: F401

from gvamp_tpu.ops.layout import PlanarLayout
from gvamp_tpu.ops import decode, matvec, special

__all__ = ["PlanarLayout", "decode", "matvec", "special"]

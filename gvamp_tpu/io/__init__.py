from gvamp_tpu.io import plink, vecio

__all__ = ["plink", "vecio"]

from nf_tpu.utils import checkpoint

__all__ = ["checkpoint"]

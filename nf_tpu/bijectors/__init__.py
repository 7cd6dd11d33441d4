from nf_tpu.bijectors import batchnorm, conditioner, coupling, permutations

__all__ = ["batchnorm", "conditioner", "coupling", "permutations"]

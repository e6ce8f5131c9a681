from theano_pyglm_tpu.ops.basis import create_basis  # noqa: F401
from theano_pyglm_tpu.ops.convolve import convolve_with_basis  # noqa: F401

from theano_pyglm_tpu.inference.map import map_fit, sparse_map_fit, cross_validate_lambda  # noqa: F401
from theano_pyglm_tpu.inference.hmc import hmc, HMCState  # noqa: F401
from theano_pyglm_tpu.inference.mcmc import gibbs_sample  # noqa: F401
from theano_pyglm_tpu.inference.ars import adaptive_rejection_sample, update_bias_ars  # noqa: F401

from theano_pyglm_tpu.models.population import Population  # noqa: F401
from theano_pyglm_tpu.models.zoo import make_model  # noqa: F401

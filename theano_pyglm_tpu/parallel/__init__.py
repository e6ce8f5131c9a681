from theano_pyglm_tpu.parallel.mesh import chain_mesh, shard_chains, replicate  # noqa: F401
from theano_pyglm_tpu.parallel.chains import gibbs_sample_chains  # noqa: F401
from theano_pyglm_tpu.parallel.neurons import make_sharded_value_and_grad  # noqa: F401

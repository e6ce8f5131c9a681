from theano_pyglm_tpu.utils.dtypes import default_float  # noqa: F401

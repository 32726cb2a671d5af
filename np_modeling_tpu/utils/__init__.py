from np_modeling_tpu.utils import (debugging, flax_compat, hf_compat,
                                   profiling, testing)

__all__ = ["debugging", "flax_compat", "hf_compat", "profiling", "testing"]

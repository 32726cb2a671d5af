from np_modeling_tpu.utils import profiling, testing

__all__ = ["profiling", "testing"]

from np_modeling_tpu.utils import debugging, profiling, testing

__all__ = ["debugging", "profiling", "testing"]

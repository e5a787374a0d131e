from pemp_tpu.data import datasets

__all__ = ["datasets"]

from pemp_tpu.core import losses, metrics, solver

__all__ = ["losses", "metrics", "solver"]

from pemp_tpu.models import registry

__all__ = ["registry"]

from gple_tpu.io.writers import OutputWriters

__all__ = ["OutputWriters"]

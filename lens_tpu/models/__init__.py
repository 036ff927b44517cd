from lens_tpu.models.lens import LensModel, QuantizedLensModel

__all__ = ["LensModel", "QuantizedLensModel"]

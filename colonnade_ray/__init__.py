"""colonnade_ray: a Ray-Data-native per-column lightweight-compression
engine — dictionary, RLE, FSST-style, bit-packing, frame-of-reference
/ delta — with per-chunk codec auto-selection.

Semantics grafted from byteverse/colonnade (see SURVEY.md); the
architecture is ray.data.Dataset pipelines of map_batches over
zero-copy Arrow batches with actor pools for stateful codec stages.
"""
__version__ = "0.1.0"

"""geosplatting_tpu — a TPU-native inverse-rendering framework.

Brand-new JAX/XLA/Pallas implementation of the capability surface of
GeoSplatting (ICCV 2025) and its rfstudio stack: differentiable Gaussian
rasterization, FlexiCubes isosurface extraction, mesh-anchored Gaussian
adaptation, split-sum / Monte-Carlo PBR environment shading, and the
three-stage inverse-rendering training pipeline.
"""

__version__ = "0.1.0"

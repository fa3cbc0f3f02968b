from .rasterizer import RasterConfig, RenderOutput, render  # noqa: F401

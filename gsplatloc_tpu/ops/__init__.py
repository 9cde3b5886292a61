"""Numerics substrate + rasterizer ops."""

from . import camera, filters, knn, lie, pca, projection, sh  # noqa: F401
from .rasterize import rasterize  # noqa: F401

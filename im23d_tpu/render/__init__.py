from im23d_tpu.render.rasterizer import rasterize
from im23d_tpu.render.renderer import Renderer, render_mesh

__all__ = ["rasterize", "Renderer", "render_mesh"]

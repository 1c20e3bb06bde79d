from im23d_tpu.geometry.objio import load_obj, save_obj, uv_sphere
from im23d_tpu.geometry.mesh_template import MeshTemplate

__all__ = ["load_obj", "save_obj", "uv_sphere", "MeshTemplate"]

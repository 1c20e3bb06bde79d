from im23d_tpu.data.shapenet import ShapeNetRenders, DataBunch, multi_view_collate
from im23d_tpu.data.synthetic import SyntheticSilhouettes

__all__ = [
    "ShapeNetRenders",
    "DataBunch",
    "multi_view_collate",
    "SyntheticSilhouettes",
]

from mapfree_tpu.visualisation.lazy_camera import LazyCamera
from mapfree_tpu.visualisation.raster import Rasterizer, frustum_mesh
from mapfree_tpu.visualisation.render_scene import (
    error_color,
    frustum_points,
    render_scene,
)

from mapfree_tpu.visualisation.lazy_camera import LazyCamera
from mapfree_tpu.visualisation.render_scene import (
    draw_frustum,
    error_color,
    frustum_points,
    render_scene,
)

from tdgp.rendering.camera import (
    sample_camera_params, sample_camera_angles, compute_cam2world_matrix,
    spherical2cartesian, normalize_vec, validate_frustum,
    get_mean_camera_params, get_mean_angles_values,
)
from tdgp.rendering.rays import sample_rays, get_ray_limits_box, validate_image_plane
from tdgp.rendering.renderer import (
    RenderOptions, importance_render, classical_ray_march, mip_ray_march,
    sample_stratified, sample_pdf,
)
